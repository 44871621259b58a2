"""Stage-2 lookup probes: in-kernel strategies.

  pgather  - Pallas kernel, jnp.take from a VMEM table with 2D operands
  ponehot  - Pallas kernel, one-hot built in VMEM + MXU matmul vs the table
             (f32 exact; no HBM one-hot traffic)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 256 * 32 * 864
NTAB = 512
T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def marginal(name, fn, x):
    try:
        f_s = jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (fn(c), ()), x, None, length=2)[0])
        f_l = jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (fn(c), ()), x, None, length=10)[0])
        float(jnp.sum(f_s(x)))
        float(jnp.sum(f_l(x)))
        best = 1e30
        for _ in range(2):
            t0 = time.time()
            float(jnp.sum(f_s(x)))
            ts = time.time() - t0
            t0 = time.time()
            float(jnp.sum(f_l(x)))
            tl = time.time() - t0
            best = min(best, (tl - ts) / 8)
        log(f"{name:8s} {best*1e3:10.3f} ms per {N/1e6:.1f}M lookups "
            f"({N/best/1e9:.2f} G/s)")
    except Exception as e:
        log(f"{name:8s} FAIL {type(e).__name__}: {str(e)[:2000]}")


def main():
    rng = np.random.default_rng(0)
    frac = jnp.asarray(
        rng.uniform(0, NTAB - 2, N).astype(np.float32)).reshape(-1, 128)
    tab = jnp.asarray(np.tile(
        rng.normal(size=(NTAB, 1)).astype(np.float32), (1, 128)))

    R = 512  # rows per pallas block -> [R, 128] per block

    def k_gather(x_ref, tab_ref, o_ref):
        x = x_ref[...]
        ii = jnp.floor(x).astype(jnp.int32)
        u = x - jnp.floor(x)
        # per-lane row lookup: out[r,l] = tab[ii[r,l], l]
        t = jnp.take_along_axis(tab_ref[...], ii, axis=0)
        o_ref[...] = x + 1e-12 * (t * u)

    def pgather(x):
        return pl.pallas_call(
            k_gather,
            grid=(x.shape[0] // R,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(x, tab)

    # one-hot + MXU inside the kernel; table as [NTAB, 128] broadcast? No:
    # out[n] = sum_k onehot[n,k] * tab[k] -> [R*?]; reshape x block to
    # [RB, NTAB] one-hot in VMEM, matmul against tab [NTAB, 1]->pad 128.
    RB = 1024
    tab_col = jnp.tile(tab[:, None], (1, 128))  # [NTAB, 128] (col-replicated)

    def k_onehot(x_ref, tab_ref, o_ref):
        x = x_ref[...]                         # [RB, 128]
        ii = jnp.floor(x).astype(jnp.int32)
        u = x - jnp.floor(x)
        # lanes hold 128 different lookups; one-hot over a new axis won't
        # fit MXU directly -- instead flatten to [RB*128 / 128, 128] rows of
        # 128 lookups each and do per-row matmul? Simpler: one-hot as
        # [RB, NTAB] for lane 0 only is wrong. Use dot_general trick:
        # out[r, l] = sum_k (ii[r, l] == k) * tab[k]
        # via comparing against iota broadcast in chunks of 128 columns.
        acc = jnp.zeros_like(x)
        for k0 in range(0, NTAB, 128):
            kk = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) + k0
            # [RB, 128] x [128]: for each of the 128 table entries in this
            # strip, accumulate tab value where ii matches
            tstrip = tab_ref[pl.ds(k0, 128), 0]          # [128]
            # match matrix per strip via equality + select-sum:
            m = (ii[:, :, None] == kk[0][None, None, :])  # [RB, 128, 128]
            acc = acc + jnp.sum(
                m.astype(jnp.float32) * tstrip[None, None, :], axis=-1)
        o_ref[...] = x + 1e-12 * (acc * u)

    def ponehot(x):
        return pl.pallas_call(
            k_onehot,
            grid=(x.shape[0] // RB,),
            in_specs=[
                pl.BlockSpec((RB, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(x, tab_col)

    marginal("pgather", pgather, frac)


if __name__ == "__main__":
    main()
