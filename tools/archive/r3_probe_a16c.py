"""A=16 sweep anomaly bisect, v3 (round 3, session 2).

Fixes r3_probe_a16b's broken resident timings (relay async hazard: the
marginal must be forced with a scalar D2H read, not block_until_ready)
and completes the variant matrix.  One scan iteration = ONE FULL SWEEP
over the real grid for that config (B cells in NCH chunks of C), so the
per-iter marginal is directly "ms per force sweep".

Variants (A=16 unless noted):
  res_sum1     resident [C,A,L] body, jnp.sum reduce (probe-a parity)
  res_var5     resident, 5-operand variadic lane reduce (real op mix)
  gat_only     row gathers + trivial compute (prices the fetch alone)
  gat_var5     gathered + chains + variadic reduce (real pass-1 shape)
  gat_var5_sj  + scalar_j/si gathers (full pass-1 mix)
  gat_pad      gather 32 nbr rows -> L=32A (lane-aligned pair tensor)
  gat_fold     A=16: reshape dr to [C,32,216] before chains+reduce
  gat_m2       A=16: merged-i rows [C,32] over 36 nbr cells (L=576)
  slice5       dense shifted-slice j-fetch (no gather), same body

Usage: ./tools/tpu_gate.sh python tools/r3_probe_a16c.py [16|32]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import os

T0 = time.time()
A = int(sys.argv[1]) if len(sys.argv) > 1 else 16
C = int(os.environ.get("PROBE_C", "256"))
B = int(os.environ.get("PROBE_B", "74088" if A == 16 else "32768"))
NCH = -(-B // C)
L = 27 * A


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def chains(r2, mask, n_outs, deg=10):
    t = r2 * 0.03 - 1.0
    b0 = jnp.ones_like(t)
    b1 = t
    outs = [b0 * (0.1 + i) + b1 * 0.2 for i in range(n_outs)]
    for _ in range(deg):
        b0, b1 = b1, 2.0 * t * b1 - b0
        outs = [o + b1 * (0.37 + 0.01 * i) for i, o in enumerate(outs)]
    return [jnp.where(mask, o, 0.0) for o in outs]


def vred(ops, axes=(2,)):
    zero = ops[0].dtype.type(0)
    return jax.lax.reduce(tuple(ops), (zero,) * len(ops),
                          lambda a, b: tuple(u + v for u, v in zip(a, b)),
                          axes)


def marginal(name, step, init, pairs):
    def scan_fn(x, length):
        out, _ = jax.lax.scan(step, x, None, length=length)
        return out[-1]          # scalar acc

    short, long = 3, 12
    f_s = jax.jit(functools.partial(scan_fn, length=short))
    f_l = jax.jit(functools.partial(scan_fn, length=long))
    float(f_s(init)); float(f_l(init))
    best = 1e30
    for _ in range(3):
        t0 = time.time(); float(f_s(init)); ts = time.time() - t0
        t0 = time.time(); float(f_l(init)); tl = time.time() - t0
        best = min(best, (tl - ts) / (long - short))
    log(f"{name:14s} {best*1e3:8.2f} ms/sweep  "
        f"{pairs/best/1e9:6.1f} Gslot-pairs/s")


def res_variant(use_var):
    def step(carry, _):
        x, acc = carry
        def body(c0):
            dr0 = x + c0 * 1e-7
            dr1 = x * 0.5 + 1.0
            dr2 = x * 0.25 - 0.5
            r2 = dr0 * dr0 + dr1 * dr1 + dr2 * dr2
            mask = (r2 <= 29.0) & (r2 > 0.0)
            if use_var:
                outs = chains(r2, mask, 3)
                red = vred([outs[0] * dr0, outs[0] * dr1, outs[0] * dr2,
                            outs[1], outs[2]])
                return sum(jnp.sum(o) for o in red)
            outs = chains(r2, mask, 1)
            return jnp.sum(outs[0] * dr0) + jnp.sum(outs[0])
        s = jax.lax.map(body, jnp.arange(NCH, dtype=jnp.float32))
        return (x * 1.0000001, acc + jnp.sum(s)), ()
    x = jnp.ones((C, A, L), jnp.float32) * 0.1
    return step, (x, jnp.zeros(())), C * A * L * NCH


def _rand_idx(rng, nnbr):
    nbr = jnp.asarray(rng.randint(0, B, (NCH, C, nnbr)).astype(np.int32))
    boxes = jnp.asarray(rng.randint(0, B, (NCH, C)).astype(np.int32))
    return boxes, nbr


def gat_variant(kind):
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.rand(3, B, A).astype(np.float32)) * 5.0
    sfield = jnp.asarray(rng.rand(B, A).astype(np.float32))
    nnbr = 32 if kind == "pad" else 27
    boxes, nbr = _rand_idx(rng, nnbr)
    Lk = nnbr * A

    def step(carry, _):
        r_c, acc = carry
        def body(args):
            boxes_c, nbr_c = args
            ri = r_c[:, boxes_c]                    # [3, C, A]
            rj = r_c[:, nbr_c].reshape(3, C, Lk)    # [3, C, Lk]
            if kind == "only":
                return jnp.sum(ri) + jnp.sum(rj)
            dr = ri[:, :, :, None] - rj[:, :, None, :]
            if kind == "fold":
                dr = dr.reshape(3, C, 2 * A, Lk // 2)
            r2 = dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2]
            mask = (r2 <= 29.0) & (r2 > 0.0)
            if kind == "sj":
                sj = sfield[nbr_c].reshape(C, 1, Lk)
                si = sfield[boxes_c][:, :, None]
                r2 = r2 + 1e-30 * (sj + si)
            outs = chains(r2, mask, 3)
            red = vred([outs[0] * dr[0], outs[0] * dr[1], outs[0] * dr[2],
                        outs[1], outs[2]])
            return sum(jnp.sum(o) for o in red)
        s = jax.lax.map(body, (boxes, nbr))
        return (r_c * 1.0000001, acc + jnp.sum(s)), ()
    return step, (r, jnp.zeros(())), C * A * Lk * NCH


def gat_m2():
    """Merged-i rows: 2 cells on sublanes [C,32], 36 nbr cells on lanes."""
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.rand(3, B, A).astype(np.float32)) * 5.0
    nch = -(-(B // 2) // C)
    boxes2 = jnp.asarray(rng.randint(0, B, (nch, C, 2)).astype(np.int32))
    nbr36 = jnp.asarray(rng.randint(0, B, (nch, C, 36)).astype(np.int32))
    L2 = 36 * A

    def step(carry, _):
        r_c, acc = carry
        def body(args):
            boxes_c, nbr_c = args
            ri = r_c[:, boxes_c].reshape(3, C, 2 * A)
            rj = r_c[:, nbr_c].reshape(3, C, L2)
            dr = ri[:, :, :, None] - rj[:, :, None, :]  # [3,C,32,576]
            r2 = dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2]
            mask = (r2 <= 29.0) & (r2 > 0.0)
            outs = chains(r2, mask, 3)
            red = vred([outs[0] * dr[0], outs[0] * dr[1], outs[0] * dr[2],
                        outs[1], outs[2]])
            return sum(jnp.sum(o) for o in red)
        s = jax.lax.map(body, (boxes2, nbr36))
        return (r_c * 1.0000001, acc + jnp.sum(s)), ()
    return step, (r, jnp.zeros(())), C * 2 * A * L2 * nch


def slice5():
    """Dense shifted-slice j-fetch (cell_pair_sweep_dense shape)."""
    rng = np.random.RandomState(0)
    pad = 2048
    Dp = NCH * C
    rp = jnp.asarray(rng.rand(3, Dp + 2 * pad, A).astype(np.float32)) * 5.0
    offs = [d for d in range(-13, 14)]   # 27 static offsets

    def step(carry, _):
        r_c, acc = carry
        def body(c0):
            ri = jax.lax.dynamic_slice_in_dim(r_c, pad + c0, C, axis=1)
            rjs = [jax.lax.dynamic_slice_in_dim(r_c, pad + c0 + d * 37,
                                                C, axis=1) for d in offs]
            rj = jnp.concatenate(rjs, axis=-1)
            dr = ri[:, :, :, None] - rj[:, :, None, :]
            r2 = dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2]
            mask = (r2 <= 29.0) & (r2 > 0.0)
            outs = chains(r2, mask, 3)
            red = vred([outs[0] * dr[0], outs[0] * dr[1], outs[0] * dr[2],
                        outs[1], outs[2]])
            return sum(jnp.sum(o) for o in red)
        starts = jnp.arange(NCH, dtype=jnp.int32) * C
        s = jax.lax.map(body, starts)
        return (r_c * 1.0000001, acc + jnp.sum(s)), ()
    return step, (rp, jnp.zeros(())), C * A * L * NCH


def main():
    sel = os.environ.get("PROBE_VARIANTS", "").split(",")
    sel = [s for s in sel if s]

    def want(name):
        return not sel or name in sel

    log(f"A={A} C={C} L={L} chunks={NCH} B={B}")
    if want("res_sum1"):
        marginal("res_sum1", *res_variant(False))
    if want("res_var5"):
        marginal("res_var5", *res_variant(True))
    if want("gat_only"):
        marginal("gat_only", *gat_variant("only"))
    if want("gat_var5"):
        marginal("gat_var5", *gat_variant("plain"))
    if want("gat_var5_sj"):
        marginal("gat_var5_sj", *gat_variant("sj"))
    if want("gat_pad"):
        marginal("gat_pad", *gat_variant("pad"))
    if A == 16:
        if want("gat_fold"):
            marginal("gat_fold", *gat_variant("fold"))
        if want("gat_m2"):
            marginal("gat_m2", *gat_m2())
    if want("slice5"):
        marginal("slice5", *slice5())


if __name__ == "__main__":
    main()
