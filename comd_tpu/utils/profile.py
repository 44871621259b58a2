"""Phase-attributed profiling (the reference's -s mode + timer hierarchy).

The production step runs as ONE fused XLA program, so wall-clock phase
attribution is impossible there (that fusion is the point).  This module
rebuilds each phase of the step as its own jitted, scanned dispatch and
times it with the marginal-block method (long minus short scan, fixed
overheads cancel -- one-off device timings are unreliable through the TPU
relay).  The resulting table is comparable to the reference's hierarchical
timer report (performanceTimers.c:55-68) and to the recorded 16-rank
breakdown in BASELINE.md (force 46.8%, eamHalo 46.7%, redistribute 51.7%).

Phases (reference enum names):
  velocity      half kick (timestep.c:109-133)
  position      drift (timestep.c:122-133)
  redistribute  rebucket sort + scatter (+ mesh atom exchange when sharded)
  atomHalo      ghost position fill alone
  force         full force evaluation (includes the in-force eamHalo)
  eamHalo       the dfEmbed halo exchange alone (EAM only)
  neighborList  Verlet list build (NL methods only)
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp


def _phase_fns(sim):
    """dict name -> (state -> state) per-shard phase functions."""
    import dataclasses
    from ..ops import binning
    from ..potentials.eam import EamPotential

    cfg, geom = sim.cfg, sim.geom
    dt = cfg.dt
    inv_mass = 1.0 / sim.mass
    sharded = hasattr(sim, "mesh")
    fns = {}

    def velocity(s, _):
        return dataclasses.replace(
            s, p=s.p + s.p.dtype.type(0.5 * dt) * s.f), ()

    def position(s, _):
        return dataclasses.replace(
            s, r=s.r + s.p * s.p.dtype.type(dt * inv_mass)), ()

    fns["velocity"] = velocity
    fns["position"] = position

    if sharded:
        from ..parallel import exchange
        plan = sim.plan
        if cfg.comm_impl == "ki":
            from ..parallel import pallas_comm
            fill = functools.partial(pallas_comm.exchange_scalar_ki,
                                     plan, geom)
        else:
            fill = functools.partial(exchange.exchange_scalar, plan, geom)

        def redistribute(s, _):
            r, p, gid, n_atoms, _nm, _ovf = binning.rebucket(
                geom, s.r, s.p, s.gid, s.n_atoms, keep_halo=True)
            r, p, gid, n_atoms, _o2 = exchange.exchange_atoms(
                plan, geom, r, p, gid, n_atoms)
            r, p, gid = binning.sort_cells(r, p, gid)
            return dataclasses.replace(s, r=r, p=p, gid=gid,
                                       n_atoms=n_atoms), ()

        def atom_halo(s, _):
            return dataclasses.replace(
                s, r=exchange.exchange_positions(plan, geom, s.r)), ()
    else:
        ext = sim.global_extent

        def redistribute(s, _):
            r, p, gid, n_atoms, _nm, _ovf = binning.rebucket(
                geom, s.r, s.p, s.gid, s.n_atoms, wrap_extent=ext)
            r, gid, n_atoms = binning.fill_halo_serial(geom, r, gid, n_atoms)
            return dataclasses.replace(s, r=r, p=p, gid=gid,
                                       n_atoms=n_atoms), ()

        def atom_halo(s, _):
            src = jnp.asarray(geom.halo_src)
            shift = jnp.asarray(geom.halo_shift, dtype=s.r.dtype)
            r = s.r.at[:, geom.n_local:].set(
                s.r[:, src] + shift.T[:, :, None])
            return dataclasses.replace(s, r=r), ()

        fill = functools.partial(binning.fill_halo_scalar_serial, geom)

    fns["redistribute"] = redistribute
    fns["atomHalo"] = atom_halo

    force = sim._force_fn()

    def force_phase(s, _):
        out = force(s.r, s.n_atoms)
        f_loc = out[0]
        f = jnp.zeros_like(s.f).at[:, :geom.n_local].set(
            f_loc.astype(s.f.dtype))
        # feed f back into r at negligible weight so the scan body is not
        # loop-invariant (XLA hoists invariant bodies -> marginal time 0)
        r = s.r + s.r.dtype.type(1e-30) * f
        return dataclasses.replace(s, f=f, r=r), ()

    fns["force"] = force_phase

    if isinstance(sim.pot, EamPotential):
        def eam_halo(s, _):
            dfe = fill(s.f[0])                 # any [B, A] field
            # fold the result back at negligible weight so XLA cannot DCE
            # the exchange (weight is nonzero: 0.0 would fold away)
            return dataclasses.replace(
                s, f=s.f.at[0].add(s.f.dtype.type(1e-30) * dfe)), ()

        fns["eamHalo"] = eam_halo

    if sim.uses_nl and getattr(sim, "nlist", None) is not None:
        from ..ops import neighborlist as nlmod
        params = sim._nl_build_params()

        def nl_build(s, _):
            nl, _ = nlmod.build(geom, s.r, s.n_atoms, **params)
            # fold a data-dependent scalar back at negligible weight so the
            # scan body is not loop-invariant (same trick as force_phase);
            # this also keeps the phase a state->state fn, so it runs
            # through the same marginal-scan (and shard_map) machinery as
            # every other phase
            dep = jnp.max(nl.nl).astype(s.r.dtype)
            return dataclasses.replace(
                s, r=s.r + s.r.dtype.type(1e-30) * dep), ()

        fns["neighborList"] = nl_build

    return fns


def profile_phases(sim, short: int = 2, long: int = 8, out=None):
    """Run the -s phase profile; returns {phase: seconds_per_invocation}.

    Each phase runs as a lax.scan block of ``short`` and ``long``
    iterations; per-invocation time is the marginal difference.
    """
    fns = _phase_fns(sim)
    sharded = hasattr(sim, "mesh")
    results = {}
    state = sim.state

    for name, fn in fns.items():
        if sharded:
            block_s = sim._wrap(fn, n_steps=short)
            block_l = sim._wrap(fn, n_steps=long)
        else:
            def mk(n, f=fn):
                @jax.jit
                def blk(s):
                    o, _ = jax.lax.scan(f, s, None, length=n)
                    return o
                return blk
            block_s, block_l = mk(short), mk(long)

        # compile + warm
        jax.block_until_ready(block_s(state))
        jax.block_until_ready(block_l(state))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(block_s(state))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(block_l(state))
            tl = time.perf_counter() - t0
            best = min(best, (tl - ts) / (long - short))
        results[name] = max(best, 0.0)
        if out is not None:
            print(f"  [profile] {name:<14} {results[name]*1e3:10.3f} ms",
                  file=out, flush=True)
    return results


def report_phases(results: dict, n_atoms: int) -> str:
    """Reference-style phase table (% of the per-step sum)."""
    step = (results.get("velocity", 0.0) * 2 + results.get("position", 0.0)
            + results.get("redistribute", 0.0) + results.get("force", 0.0))
    step = step or 1e-30
    lines = [
        "",
        "Phase profile (marginal per-invocation, -s mode)",
        "------------------------------------------------",
        f"{'Phase':<16}{'ms/invoc':>12}{'% step':>9}",
    ]
    for name, t in results.items():
        lines.append(f"{name:<16}{t*1e3:>12.3f}{100.0*t/step:>8.2f}")
    lines.append(f"{'step (sum)':<16}{step*1e3:>12.3f}{100.0:>8.2f}")
    lines.append(
        f"atom rate at this breakdown: {n_atoms/step/1e6:.3f} atoms/us")
    return "\n".join(lines)
