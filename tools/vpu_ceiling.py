"""Measure the VPU elementwise-FMA ceiling through the relay.

Marginal method: time K and 3K chained FMA sweeps over a resident [N] f32
array inside one jitted scan; ops/s = extra_ops / extra_time.
"""
import sys
import time
import jax
import jax.numpy as jnp

N = 64 * 1024 * 1024   # 256 MB resident, enough rows to hide latency
K_SHORT, K_LONG = 64, 192
REPS = 20


def chain(x, k):
    for i in range(k):
        x = x * 1.0000001 + 0.3
    return x


def make(k):
    @jax.jit
    def f(x):
        def body(c, _):
            return chain(c, k), ()
        y, _ = jax.lax.scan(body, x, None, length=REPS)
        return y
    return f


def main():
    x = jnp.full((N,), 0.5, jnp.float32)
    fs = make(K_SHORT)
    fl = make(K_LONG)
    float(fs(x)[0]); float(fl(x)[0])
    best = 1e30
    for _ in range(3):
        t0 = time.time(); float(fs(x)[0]); ts = time.time() - t0
        t0 = time.time(); float(fl(x)[0]); tl = time.time() - t0
        best = min(best, (tl - ts))
    extra_ops = (K_LONG - K_SHORT) * REPS * N  # FMAs
    print(f"marginal {best*1e3:.1f} ms for {extra_ops/1e9:.1f} GFMA "
          f"-> {extra_ops/best/1e12:.2f} TFMA/s "
          f"({2*extra_ops/best/1e12:.2f} TFLOP/s)")


if __name__ == "__main__":
    main()
