"""Checkpoint / resume.

The reference has no checkpointing ("code to read/write atomic positions has
been removed", CoMD.c:1147-1152); long production runs are a stated use case
(CoMD.c:799-806), so the TPU rebuild adds it.  Orbax handles sharded arrays
natively when available; a plain .npz fallback covers single-host states.

The checkpoint captures the exact dynamical state (r, p, f, gid, n_atoms) --
restart continues the trajectory bit-for-bit, because the state layout is
canonical and the step function is deterministic.
"""
from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np


def save(path: str, sim, step: int) -> str:
    """Save a Simulation/ShardedSimulation state.  Returns the path."""
    os.makedirs(path, exist_ok=True)
    state = sim.state
    meta = {
        "step": step,
        "config": dataclasses.asdict(sim.cfg),
        "n_global": sim.n_global,
        "format": "npz",
    }
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(os.path.abspath(path), "state"),
                   jax.tree.map(np.asarray, dataclasses.asdict(state)),
                   force=True)
        ckptr.wait_until_finished()
        meta["format"] = "orbax"
    except Exception:
        arrays = {f: np.asarray(getattr(state, f))
                  for f in ("r", "p", "f", "gid", "n_atoms",
                            "e_potential", "n_local", "overflow")}
        np.savez_compressed(os.path.join(path, "state.npz"), **arrays)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    return path


def load(path: str):
    """Returns (Simulation, step) resumed from a checkpoint directory."""
    from ..config import Config
    from ..sim import SimState, init_simulation

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    cfg = Config(**meta["config"])
    # rebuild static structures (geometry, potential) from config, then
    # overwrite the dynamical state
    sim = init_simulation(cfg)

    if meta["format"] == "orbax":
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        tpl = jax.tree.map(np.asarray, dataclasses.asdict(sim.state))
        data = ckptr.restore(os.path.join(os.path.abspath(path), "state"),
                             tpl)
    else:
        with np.load(os.path.join(path, "state.npz")) as z:
            data = {k: z[k] for k in z.files}

    import jax.numpy as jnp
    sim.state = SimState(**{k: jnp.asarray(v) for k, v in data.items()})
    if getattr(sim, "uses_nl", False):
        sim.build_neighbor_list()
    return sim, meta["step"]
