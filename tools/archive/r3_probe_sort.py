"""Probe: where do the redistribute's 130 ms go (sort vs scatters), and
does batching the payload scatters over shared indices help?

The rebucket (ops/binning.py) = one lax.sort((box, gid, idx), num_keys=2)
over flat_n = n_local*A elements + 7 independent 1-D scatter-sets with the
same destination vector (3 r + 3 p + gid) + 1 scatter-add (counts).  If
scatters are index-bound (per-element ~0.22 G/s on v5e), a single scatter
with a leading batch axis ([K, N] payload, shared dest) should cost ~1x,
not Kx.

Marginal method (long-short scan blocks) as everywhere.

Usage: python tools/r3_probe_sort.py [flat_n] (default 1185408 = 74088*16)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def marginal(fn, x, short=2, long=6, block=4):
    """Per-invocation seconds of fn, by scanned long-short difference."""
    def mk(k):
        def chained(x0):
            y = x0
            for _ in range(k * block):   # data-dependent chain
                y = fn(y)
            return y
        return jax.jit(chained)
    fs, fl = mk(short), mk(long)
    ys = fs(x); jax.block_until_ready(ys)
    yl = fl(x); jax.block_until_ready(yl)
    best = np.inf
    for _ in range(3):
        t0 = time.time(); jax.block_until_ready(fs(x)); ts = time.time() - t0
        t0 = time.time(); jax.block_until_ready(fl(x)); tl = time.time() - t0
        per = (tl - ts) / ((long - short) * block)
        if per > 0:
            best = min(best, per)
    return best


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 74088 * 16
    key = jax.random.PRNGKey(0)
    box = jax.random.randint(key, (N,), 0, 90000, jnp.int32)
    gid = jax.random.randint(key, (N,), 0, 2_000_000, jnp.int32)
    vals = jax.random.normal(key, (6, N), jnp.float32)
    dest = jax.random.randint(key, (N,), 0, N, jnp.int32)

    def t_sort3(x):
        b, g, p = jax.lax.sort((x, gid, jax.lax.iota(jnp.int32, N)),
                               num_keys=2)
        return b + p  # keep data dependence

    def t_sort1(x):
        return jax.lax.sort(x)

    def t_scatter1(x):
        out = jnp.zeros((N,), jnp.float32).at[dest].set(x[0])
        return x.at[0].set(out)

    def t_scatter6(x):
        out = jnp.zeros((6, N), jnp.float32).at[:, dest].set(x)
        return out

    def t_gather6(x):
        return x[:, dest]

    print(f"N={N}", flush=True)
    for name, fn, x in [
        ("sort 3op 2key", t_sort3, box),
        ("sort 1op", t_sort1, box),
        ("scatter-set 1x [N]", t_scatter1, vals),
        ("scatter-set [6,N] shared dest", t_scatter6, vals),
        ("gather [6,N] shared idx", t_gather6, vals),
    ]:
        try:
            t = marginal(fn, x)
            print(f"{name:<32} {t*1e3:9.3f} ms", flush=True)
        except Exception as e:
            print(f"{name:<32} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
