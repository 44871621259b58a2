"""Why does the A=16 sweep cost ~1.9x per slot-pair vs A=32? (round 3)

Isolates the pair-tensor shape from the rest of the step: a synthetic
sweep body (FMA chain + mask + lane reduce, ~the pass-1 op mix) marginal-
timed at [C, 16, 512] vs [C, 32, 896] with equal TOTAL slot-pair counts.
If the synthetic ratio is ~1 the regression is a fusion artifact of the
real step; if ~1.9 it is intrinsic to the shape (sublane utilization).

Usage: ./tools/tpu_gate.sh python tools/r3_probe_a16.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def body_like(dr0, dr1, dr2, deg=10):
    """~pass-1 op mix: r2, mask, shared-basis chain, 4 output FMAs, reduce."""
    r2 = dr0 * dr0 + dr1 * dr1 + dr2 * dr2
    mask = (r2 <= 29.0) & (r2 > 0.0)
    t = r2 * 0.03 - 1.0
    b0 = jnp.ones_like(t)
    b1 = t
    outs = [b0 * 0.1 + b1 * 0.2 for _ in range(1)]
    for _ in range(deg):
        b0, b1 = b1, 2.0 * t * b1 - b0
        outs = [o + b1 * 0.37 for o in outs]
    val = jnp.where(mask, outs[0], 0.0)
    return jnp.sum(val * dr0, axis=-1), jnp.sum(val, axis=-1)


def run(C, A, L, n_chunks, label):
    shape = (C, A, L)

    def step(carry, _):
        x, acc1, acc2 = carry
        def chunk_body(c0):
            dr0 = x + c0 * 1e-7
            dr1 = x * 0.5 + 1.0
            dr2 = x * 0.25 - 0.5
            return body_like(dr0, dr1, dr2)
        s1, s2 = jax.lax.map(chunk_body,
                             jnp.arange(n_chunks, dtype=jnp.float32))
        return (x * 1.0000001, acc1 + jnp.sum(s1), acc2 + jnp.sum(s2)), ()

    def scan_fn(x, length):
        init = (x, jnp.zeros(()), jnp.zeros(()))
        out, _ = jax.lax.scan(step, init, None, length=length)
        return out[1] + out[2]

    x = jnp.ones(shape, jnp.float32) * 0.1
    short, long = 3, 12
    f_s = jax.jit(functools.partial(scan_fn, length=short))
    f_l = jax.jit(functools.partial(scan_fn, length=long))
    float(f_s(x)); float(f_l(x))
    best = 1e30
    for _ in range(3):
        t0 = time.time(); float(f_s(x)); ts = time.time() - t0
        t0 = time.time(); float(f_l(x)); tl = time.time() - t0
        best = min(best, (tl - ts) / (long - short))
    pairs = C * A * L * n_chunks
    log(f"{label:28s} {best*1e3:8.2f} ms/iter  "
        f"{pairs/best/1e9:7.2f} Gpair-slots/s")
    return pairs / best


def main():
    # equal total slot-pairs: 128 chunks of [256,32,896] == 2.867e8
    # vs 229 chunks of [256,16,512] == 3.00e8 (within 5%)
    r32 = run(256, 32, 896, 128, "[256,32,896] x128 (k=4-like)")
    r16 = run(256, 16, 512, 229, "[256,16,512] x229 (k=3-like)")
    r16b = run(512, 16, 512, 115, "[512,16,512] x115 (2x chunk)")
    r16c = run(256, 16, 896, 131, "[256,16,896] x131 (wide lanes)")
    log(f"per-slot-pair ratio A16/A32: {r32/r16:.2f} "
        f"(2xchunk {r32/r16b:.2f}, wide {r32/r16c:.2f})")


if __name__ == "__main__":
    main()
