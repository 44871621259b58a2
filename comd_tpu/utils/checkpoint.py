"""Checkpoint / resume.

The reference has no checkpointing ("code to read/write atomic positions has
been removed", CoMD.c:1147-1152); long production runs are a stated use case
(CoMD.c:799-806), so the TPU rebuild adds it.  Orbax handles sharded arrays
natively when available; a plain .npz fallback covers single-host states.

The checkpoint captures the exact dynamical state (r, p, f, gid, n_atoms)
plus the lazy-shell rebucket baseline (last_r) -- restart continues the
trajectory bit-for-bit on the cell paths, because the state layout is
canonical and the step function is deterministic.  The NL path rebuilds its
Verlet list from the restored positions (same pairs within cutoff, possibly
different summation order -> trajectories match to fp tolerance).
"""
from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

_FIELDS = ("r", "p", "f", "gid", "n_atoms", "e_potential", "n_local",
           "overflow")


def _state_dict(sim, as_numpy: bool = True) -> dict:
    conv = np.asarray if as_numpy else (lambda x: x)
    d = {f: conv(getattr(sim.state, f)) for f in _FIELDS}
    last_r = getattr(sim, "last_r", None)
    if last_r is not None:
        d["last_r"] = conv(last_r)
    return d


def save(path: str, sim, step: int) -> str:
    """Save a Simulation/ShardedSimulation state.  Returns the path.

    Multi-process: a collective orbax save of the global arrays (every
    process calls with the same path); process 0 writes the metadata."""
    multi = jax.process_count() > 1
    if not multi or jax.process_index() == 0:
        os.makedirs(path, exist_ok=True)
    arrays = _state_dict(sim, as_numpy=not multi)
    meta = {
        "step": step,
        "config": dataclasses.asdict(sim.cfg),
        "n_global": sim.n_global,
        "has_last_r": "last_r" in arrays,
        "format": "npz",
    }
    if multi:
        # metadata first (process 0), THEN the collective orbax save, THEN
        # a global barrier: when save() returns on ANY process, the whole
        # checkpoint (metadata included) is on disk -- a load immediately
        # after is race-free on every rank
        import orbax.checkpoint as ocp
        from jax.experimental import multihost_utils
        meta["format"] = "orbax"
        if jax.process_index() == 0:
            with open(os.path.join(path, "meta.json"), "w") as fh:
                json.dump(meta, fh, indent=1)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(os.path.abspath(path), "state"), arrays,
                   force=True)
        ckptr.wait_until_finished()
        multihost_utils.sync_global_devices("comd_ckpt_save")
        return path
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(os.path.abspath(path), "state"), arrays,
                   force=True)
        ckptr.wait_until_finished()
        meta["format"] = "orbax"
    except Exception:
        np.savez_compressed(os.path.join(path, "state.npz"), **arrays)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    return path


def load(path: str):
    """Returns (Simulation, step) resumed from a checkpoint directory."""
    import jax.numpy as jnp
    from ..config import Config
    from ..sim import SimState, init_simulation

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    cfg = Config(**meta["config"])
    # rebuild static structures (geometry, potential) from config, then
    # overwrite the dynamical state
    sim = init_simulation(cfg)

    multi = jax.process_count() > 1
    if meta["format"] == "orbax":
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        # template arrays carry the target shardings; under multi-process
        # the restore is collective and lands shards on their owners
        tpl = _state_dict(sim, as_numpy=not multi)
        if meta.get("has_last_r") and "last_r" not in tpl:
            tpl["last_r"] = tpl["r"]
        data = ckptr.restore(os.path.join(os.path.abspath(path), "state"),
                             tpl)
    else:
        if multi:
            raise RuntimeError(
                "multi-process restore requires an orbax checkpoint")
        with np.load(os.path.join(path, "state.npz")) as z:
            data = {k: z[k] for k in z.files}

    last_r = data.pop("last_r", None)
    mesh = getattr(sim, "mesh", None)
    if multi:
        sim.state = SimState(**data)
        if last_r is not None:
            sim.last_r = last_r
    elif mesh is not None:
        # sharded restore: re-apply the mesh sharding the step functions
        # expect (leading [Px,Py,Pz] block dims over ('x','y','z'))
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard = NamedSharding(mesh, P("x", "y", "z"))
        rep = NamedSharding(mesh, P())

        def put(name, v):
            v = jnp.asarray(v)
            return jax.device_put(
                v, rep if name in ("e_potential", "n_local", "overflow")
                else shard)

        sim.state = SimState(**{k: put(k, v) for k, v in data.items()})
        if last_r is not None:
            sim.last_r = jax.device_put(jnp.asarray(last_r), shard)
    else:
        sim.state = SimState(**{k: jnp.asarray(v) for k, v in data.items()})
        if last_r is not None:
            sim.last_r = jnp.asarray(last_r)
    if last_r is None and getattr(sim, "uses_lazy", False):
        # legacy checkpoint without the baseline: the restored positions may
        # already be up to skin/2 from the true rebucket layout, so seeding
        # last_r from them would permit a full skin of drift.  Clear the
        # baseline and force an immediate rebucket by leaving last_r at the
        # sentinel (far) coordinates of a fresh state.
        sim.last_r = jax.tree.map(
            lambda x: jnp.full_like(x, 1.0e10), sim.state.r)
    if getattr(sim, "uses_nl", False):
        sim.build_neighbor_list()
    return sim, meta["step"]
