"""Probe the two-level lookup with sweep-shaped inputs to find the real
bottleneck: [256, 32, 864] chunk tensors vs flat arrays, with/without the
internal batching, with/without the surrounding pair-1 math.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import comd_tpu  # noqa: E402
from comd_tpu.potentials import tables  # noqa: E402
from comd_tpu.potentials.eam import init_eam_pot  # noqa: E402

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def marginal(name, fn, *xs):
    try:
        f_s = jax.jit(lambda *xs: jax.lax.scan(
            lambda c, _: (fn(*c), ()), xs, None, length=2)[0])
        f_l = jax.jit(lambda *xs: jax.lax.scan(
            lambda c, _: (fn(*c), ()), xs, None, length=10)[0])
        float(jnp.sum(f_s(*xs)[0]))
        float(jnp.sum(f_l(*xs)[0]))
        best = 1e30
        for _ in range(2):
            t0 = time.time()
            float(jnp.sum(f_s(*xs)[0]))
            ts = time.time() - t0
            t0 = time.time()
            float(jnp.sum(f_l(*xs)[0]))
            tl = time.time() - t0
            best = min(best, (tl - ts) / 8)
        log(f"{name:28s} {best*1e3:9.3f} ms/iter")
    except Exception as e:
        log(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:120]}")


def main():
    pot = init_eam_pot("/root/repo/pots", "Cu_u6.eam", "funcfl")
    tab = pot.phi
    T2np, nb = tables.pack_twolevel([pot.phi, pot.rho], block_rows=8)
    T2 = jnp.asarray(T2np, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    r3d = jnp.asarray(rng.uniform(1.0, 5.4,
                                  (256, 32, 864)).astype(np.float32))
    mask = r3d < 4.95

    def tl(rr, batch):
        outs = tables.interpolate_twolevel(
            T2, nb, 8, 2, tab.n, tab.x0, tab.inv_dx, rr, batch=batch)
        (phi, dphi), (rho, drho) = outs
        return (rr + 1e-12 * (phi + dphi + rho + drho),)

    # shape variants
    marginal("3d batch=4096", lambda r: tl(r, 4096), r3d)
    marginal("3d batch=65536", lambda r: tl(r, 65536), r3d)
    marginal("3d one-matmul", lambda r: tl(r, 256 * 32 * 864), r3d)

    # with the pair-1 surrounding math (mask, sqrt, where)
    def pair1ish(r, m):
        r2 = r * r
        rr = jnp.sqrt(jnp.where(m, r2, 1.0))
        (phi, dphi), (rho, drho) = tables.interpolate_twolevel(
            T2, nb, 8, 2, tab.n, tab.x0, tab.inv_dx, rr, batch=4096)
        phi = jnp.where(m, phi, 0.0)
        fcoef = jnp.where(m, -dphi / rr, 0.0)
        return (r + 1e-12 * (phi + fcoef + rho), m)

    marginal("pair1-ish batch=4096", pair1ish, r3d, mask)

    # rows-gather on the same shape for comparison
    phi_st = pot.phi.stencil_device(jnp.float32)

    def rows(r, m):
        rr = jnp.sqrt(jnp.where(m, r * r, 1.0))
        f, df = tables.interpolate4(phi_st, tab.n, tab.x0, tab.inv_dx, rr)
        return (r + 1e-12 * (f + df), m)

    marginal("rows-gather (1 table)", rows, r3d, mask)


if __name__ == "__main__":
    main()
