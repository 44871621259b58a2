"""Bisect the A=16 sweep anomaly: add real-pass features to the synthetic
body one at a time at [C, 16, 512] until the ~2x per-slot-pair cost
appears.  (Round-3 follow-up to r3_probe_a16.py, which showed the bare
shape is fine at 92 G slot-pairs/s while the real pass runs at ~21.)

Usage: ./tools/tpu_gate.sh python tools/r3_probe_a16b.py [A]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

T0 = time.time()
A = int(sys.argv[1]) if len(sys.argv) > 1 else 16
C = 256
NCH = 229 if A == 16 else 128      # ~3e8 slot-pairs either way
L = 27 * A
B = 74088 if A == 16 else 32768    # cells (63^3 k=3 / 64^3 k=4 grids)


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def chains(r2, mask, n_outs, deg=10):
    """Shared-basis Clenshaw-ish chain feeding n_outs coefficient FMAs."""
    t = r2 * 0.03 - 1.0
    b0 = jnp.ones_like(t)
    b1 = t
    outs = [b0 * (0.1 + i) + b1 * 0.2 for i in range(n_outs)]
    for _ in range(deg):
        b0, b1 = b1, 2.0 * t * b1 - b0
        outs = [o + b1 * (0.37 + 0.01 * i) for i, o in enumerate(outs)]
    return [jnp.where(mask, o, 0.0) for o in outs]


def marginal(name, step, init):
    def scan_fn(x, length):
        out, _ = jax.lax.scan(step, x, None, length=length)
        return out

    short, long = 3, 12
    f_s = jax.jit(functools.partial(scan_fn, length=short))
    f_l = jax.jit(functools.partial(scan_fn, length=long))
    r = f_s(init); jax.block_until_ready(r)
    r = f_l(init); jax.block_until_ready(r)
    best = 1e30
    for _ in range(3):
        t0 = time.time(); jax.block_until_ready(f_s(init)); ts = time.time() - t0
        t0 = time.time(); jax.block_until_ready(f_l(init)); tl = time.time() - t0
        best = min(best, (tl - ts) / (long - short))
    pairs = C * A * L * NCH
    log(f"{name:34s} {best*1e3:8.2f} ms/iter  "
        f"{pairs/best/1e9:6.1f} Gslot-pairs/s")


def resident_variant(n_outs, n_red):
    """Dense resident j-block; n_red-operand variadic reduce."""
    def step(carry, _):
        x, acc = carry
        def body(c0):
            dr0 = x + c0 * 1e-7
            dr1 = x * 0.5 + 1.0
            dr2 = x * 0.25 - 0.5
            r2 = dr0 * dr0 + dr1 * dr1 + dr2 * dr2
            mask = (r2 <= 29.0) & (r2 > 0.0)
            outs = chains(r2, mask, n_outs)
            ops = [outs[0] * dr0, outs[0] * dr1, outs[0] * dr2] + outs[1:]
            ops = ops[:n_red]
            zero = r2.dtype.type(0)
            red = jax.lax.reduce(tuple(ops), (zero,) * len(ops),
                                 lambda a, b: tuple(u + v for u, v in
                                                    zip(a, b)), (2,))
            return sum(jnp.sum(o) for o in red)
        s = jax.lax.map(body, jnp.arange(NCH, dtype=jnp.float32))
        return (x * 1.0000001, acc + jnp.sum(s)), ()
    x = jnp.ones((C, A, L), jnp.float32) * 0.1
    return step, (x, jnp.zeros(()))


def gathered_variant(n_outs, n_red, with_sj):
    """Real fetch: per-chunk row gather from [3, B, A] + optional scalar_j
    gather, then the same chain + variadic reduce."""
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.rand(3, B, A).astype(np.float32)) * 5.0
    sfield = jnp.asarray(rng.rand(B, A).astype(np.float32))
    nbr = jnp.asarray(
        rng.randint(0, B, (NCH, C, 27)).astype(np.int32))
    boxes = jnp.asarray(
        rng.randint(0, B, (NCH, C)).astype(np.int32))

    def step(carry, _):
        r_c, acc = carry
        def body(args):
            boxes_c, nbr_c = args
            ri = r_c[:, boxes_c]                    # [3, C, A]
            rj = r_c[:, nbr_c].reshape(3, C, L)     # [3, C, 27A]
            dr = ri[:, :, :, None] - rj[:, :, None, :]
            r2 = dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2]
            mask = (r2 <= 29.0) & (r2 > 0.0)
            if with_sj:
                sj = sfield[nbr_c].reshape(C, 1, L)
                si = sfield[boxes_c][:, :, None]
                r2 = r2 + 0.0 * (sj + si)   # force the operands live
            outs = chains(r2, mask, n_outs)
            ops = [outs[0] * dr[0], outs[0] * dr[1], outs[0] * dr[2]] \
                + outs[1:]
            ops = ops[:n_red]
            zero = r2.dtype.type(0)
            red = jax.lax.reduce(tuple(ops), (zero,) * len(ops),
                                 lambda a, b: tuple(u + v for u, v in
                                                    zip(a, b)), (2,))
            return sum(jnp.sum(o) for o in red)
        s = jax.lax.map(body, (boxes, nbr))
        return (r_c * 1.0000001, acc + jnp.sum(s)), ()
    return step, (r, jnp.zeros(()))


def main():
    log(f"A={A} C={C} L={L} chunks={NCH} B={B}")
    marginal("resident 1out 3red", *resident_variant(1, 3))
    marginal("resident 3out 5red (real mix)", *resident_variant(3, 5))
    marginal("gathered 1out 3red", *gathered_variant(1, 3, False))
    marginal("gathered 3out 5red", *gathered_variant(3, 5, False))
    marginal("gathered 3out 5red + scalar_j", *gathered_variant(3, 5, True))


if __name__ == "__main__":
    main()
