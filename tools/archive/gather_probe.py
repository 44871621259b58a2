"""Probe table-lookup strategies on the TPU: what's the fastest way to
evaluate f(idx) for ~7M indices from a ~500-entry table?

Variants:
  flat4   - 4 scalar gathers from a flat [n+3] table (original; crashes/slow)
  rows    - 1 row gather from the [n+1, 4] stencil matrix (current; slow)
  onehot  - one-hot matmul [N,512] @ [512,4] on the MXU
  pallas  - Pallas kernel, table resident in VMEM, jnp.take inside
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 256 * 32 * 864  # one chunk's worth of pair lookups (~7.1M)
NTAB = 512

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def marginal(name, fn, x):
    try:
        f5 = jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (fn(c), ()), x, None, length=2)[0])
        f25 = jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (fn(c), ()), x, None, length=10)[0])
        float(jnp.sum(f5(x)))
        float(jnp.sum(f25(x)))
        best = 1e30
        for _ in range(2):
            t0 = time.time()
            float(jnp.sum(f5(x)))
            ts = time.time() - t0
            t0 = time.time()
            float(jnp.sum(f25(x)))
            tl = time.time() - t0
            best = min(best, (tl - ts) / 8)
        log(f"{name:8s} {best*1e3:10.3f} ms per {N/1e6:.1f}M lookups "
            f"({N/best/1e9:.2f} G/s)")
    except Exception as e:
        log(f"{name:8s} FAIL {type(e).__name__}: {str(e)[:90]}")


def main():
    rng = np.random.default_rng(0)
    frac = jnp.asarray(rng.uniform(0, NTAB - 2, N).astype(np.float32))
    tab_flat = jnp.asarray(rng.normal(size=NTAB + 3).astype(np.float32))
    tab_rows = jnp.stack([tab_flat[i:i + NTAB] for i in range(4)], axis=1)

    def flat4(x):
        ii = jnp.floor(x).astype(jnp.int32)
        u = x - jnp.floor(x)
        a = tab_flat[ii]
        b = tab_flat[ii + 1]
        c = tab_flat[ii + 2]
        d = tab_flat[ii + 3]
        return x + 1e-12 * (a + u * (b + u * (c + d)))

    def rows(x):
        ii = jnp.floor(x).astype(jnp.int32)
        u = x - jnp.floor(x)
        r = tab_rows[ii]
        return x + 1e-12 * (r[..., 0] + u * (r[..., 1] +
                                             u * (r[..., 2] + r[..., 3])))

    def onehot(x):
        ii = jnp.floor(x).astype(jnp.int32)
        u = x - jnp.floor(x)
        # process in [rows, NTAB] sub-batches to bound the one-hot tensor
        xb = ii.reshape(-1, 4096)
        ub = u.reshape(-1, 4096)
        def body(args):
            iib, uub = args
            oh = jax.nn.one_hot(iib, NTAB, dtype=jnp.float32)
            vals = oh @ tab_rows[:NTAB]          # [4096, 4]
            return (uub * vals[:, 0] + vals[:, 1] +
                    uub * (vals[:, 2] + vals[:, 3]))
        out = jax.lax.map(body, (xb, ub))
        return x + 1e-12 * out.reshape(x.shape)

    CH = 8 * 1024

    def pallas_kernel(x_ref, tab_ref, o_ref):
        x = x_ref[...]
        ii = jnp.floor(x).astype(jnp.int32)
        u = x - jnp.floor(x)
        r = jnp.take(tab_ref[...], ii, axis=0)   # [CH, 4] VMEM gather
        o_ref[...] = x + 1e-12 * (r[:, 0] + u * (r[:, 1] +
                                                 u * (r[:, 2] + r[:, 3])))

    def pallas_take(x):
        xf = x.reshape(-1)
        out = pl.pallas_call(
            pallas_kernel,
            grid=(xf.shape[0] // CH,),
            in_specs=[
                pl.BlockSpec((CH,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CH,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xf.shape, jnp.float32),
        )(xf, tab_rows)
        return out.reshape(x.shape)

    for name, fn in [("rows", rows), ("flat4", flat4),
                     ("pallas", pallas_take), ("onehot", onehot)]:
        marginal(name, fn, frac)


if __name__ == "__main__":
    main()
