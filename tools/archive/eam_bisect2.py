"""Stage-2 bisect: which scan composition of the EAM step faults on TPU?"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import comd_tpu  # noqa: E402
from comd_tpu import Config  # noqa: E402
from comd_tpu.sim import init_simulation  # noqa: E402
from comd_tpu.ops import binning, force_eam, neighborlist as nlmod  # noqa: E402

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def stage(name, fn, *args):
    try:
        out = fn(*args)
        val = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        log(f"PASS {name} (sum {val:.3e})")
        return True
    except Exception as e:
        log(f"FAIL {name}: {type(e).__name__}: {str(e)[:100]}")
        return False


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = Config(nx=n, ny=n, nz=n, doeam=True, temperature=600.0,
                 dtype="float32", max_atoms=32, box_chunk=chunk,
                 pot_dir="/root/repo/pots")
    sim = init_simulation(cfg)
    geom, pot = sim.geom, sim.pot
    st = sim.state
    log(f"init ok boxes={geom.n_local}")
    fill = functools.partial(binning.fill_halo_scalar_serial, geom)
    dt, inv_mass = cfg.dt, 1.0 / pot.mass

    # A: scan-5 of eam_force alone
    def scanA(r):
        def body(r, _):
            f, _u, _d = force_eam.eam_force(geom, pot, r, fill, chunk=chunk)
            return r + 1e-30 * jnp.pad(
                f, ((0, 0), (0, geom.n_halo), (0, 0))), ()
        return jax.lax.scan(body, r, None, length=5)[0]
    if not stage("A: scan(eam_force)", jax.jit(scanA), st.r):
        return

    # B: + kick/drift/halo-refresh (no rebucket, no cond)
    def scanB(carry):
        r, p, f = carry
        def body(c, _):
            r, p, f = c
            p = p + jnp.float32(0.5 * dt) * f
            r = r + p * jnp.float32(dt * inv_mass)
            src = jnp.asarray(geom.halo_src)
            shift = jnp.asarray(geom.halo_shift, dtype=r.dtype)
            r = r.at[:, geom.n_local:].set(r[:, src] + shift.T[:, :, None])
            floc, _u, _d = force_eam.eam_force(geom, pot, r, fill,
                                               chunk=chunk)
            f = jnp.zeros_like(f).at[:, :geom.n_local].set(floc)
            p = p + jnp.float32(0.5 * dt) * f
            return (r, p, f), ()
        return jax.lax.scan(body, carry, None, length=5)[0]
    if not stage("B: scan(kick/drift/halo/force)", jax.jit(scanB),
                 (st.r, st.p, st.f)):
        return

    # C: full lazy step via the real machinery
    def run5():
        sim.step_block(5)
        return sim.state.e_potential
    stage("C: full lazy step x5", run5)


if __name__ == "__main__":
    main()
