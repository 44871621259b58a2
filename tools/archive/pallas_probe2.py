"""Probe 2: EAM-like kernel load with the offsets loop as a fori_loop over
a pre-staged neighbor-slab scratch buffer (bounds Mosaic's stack).

Structure:
  - unrolled loop copies the 27 static lane-offset slices into nbr scratch
    [27, 3, A, CB]  (writes to a ref: no SSA buffer growth)
  - lax.fori_loop over 27 does the physics (two deg-16 Clenshaw chains)
    with a bounded live set, reading nbr[k] by dynamic leading index.

Run: ./tools/tpu_gate.sh python tools/pallas_probe2.py [interp]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A, C, PAD = 32, 256, 553          # 131k-scale pad
CB = 128
W = -(-(C + 2 * PAD) // 128) * 128
OFFSETS = tuple(np.random.RandomState(1).choice(
    np.arange(-PAD, PAD), 26, replace=False).tolist()) + (0,)
COEF = tuple(np.random.RandomState(2).uniform(-1, 1, 17).tolist())
DCOEF = tuple(np.random.RandomState(3).uniform(-1, 1, 16).tolist())


def clenshaw(coef, t2):
    b0 = jnp.zeros_like(t2)
    b1 = jnp.zeros_like(t2)
    for k in range(len(coef) - 1, 0, -1):
        b0, b1 = t2 * b0 - b1 + np.float32(coef[k]), b0
    return np.float32(0.5) * t2 * b0 - b1 + np.float32(coef[0])


def kernel(rp_ref, fx_ref, u_ref, rho_ref, win, nbr, sem):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        rp_ref.at[:, :, pl.ds(i * jnp.int32(C), W)], win,
        sem.at[jnp.int32(0)])
    dma.start()
    dma.wait()

    for b0 in range(0, C, CB):
        base = PAD + b0
        # stage the 27 neighbor slabs (writes into scratch, bounded SSA)
        for k, d in enumerate(OFFSETS):
            nbr[k, :, :, :] = win[:, :, base + d:base + d + CB]
        xi = win[0, :, base:base + CB]
        yi = win[1, :, base:base + CB]
        zi = win[2, :, base:base + CB]

        def body(k, carry):
            fx, u, rho = carry
            xj = nbr[k, 0]
            yj = nbr[k, 1]
            zj = nbr[k, 2]
            dx = xi[:, None, :] - xj[None, :, :]
            dy = yi[:, None, :] - yj[None, :, :]
            dz = zi[:, None, :] - zj[None, :, :]
            r2 = dx * dx + dy * dy + dz * dz
            mask = (r2 <= np.float32(29.0)) & (r2 > 0)
            t2 = jnp.clip(r2, np.float32(4.0), np.float32(29.0)) * \
                np.float32(0.16) - np.float32(2.64)
            phi = clenshaw(COEF, t2)
            dphi = clenshaw(DCOEF, t2)
            rhov = clenshaw(COEF[::-1], t2)
            fc = jnp.where(mask, np.float32(-2.0) * dphi, 0.0)
            fx = fx + jnp.sum(fc * dx, axis=1)
            u = u + jnp.sum(jnp.where(mask, phi, 0.0), axis=1)
            rho = rho + jnp.sum(jnp.where(mask, rhov, 0.0), axis=1)
            return fx, u, rho

        z = jnp.zeros((A, CB), jnp.float32)
        fx, u, rho = jax.lax.fori_loop(jnp.int32(0), jnp.int32(27), body,
                                       (z, z, z))
        fx_ref[:, b0:b0 + CB] = fx
        u_ref[:, b0:b0 + CB] = u
        rho_ref[:, b0:b0 + CB] = rho


def main():
    D = 8 * C
    n_chunks = D // C
    rng = np.random.RandomState(0)
    L = (n_chunks - 1) * C + W
    rp = rng.uniform(0, 40, size=(3, A, L)).astype(np.float32)

    f = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((A, C), lambda i: (jnp.zeros_like(i), i),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((A, D), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((3, A, W), jnp.float32),
                        pltpu.VMEM((27, 3, A, CB), jnp.float32),
                        pltpu.SemaphoreType.DMA((1,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=len(sys.argv) > 1 and sys.argv[1] == "interp",
    )
    t0 = time.time()
    fx, u, rho = f(rp)
    fx.block_until_ready()
    print(f"compile+run {time.time()-t0:.1f}s")

    # timing: marginal over repeated calls
    for _ in range(3):
        t0 = time.time()
        for _ in range(10):
            fx, u, rho = f(rp)
        fx.block_until_ready()
        dt = (time.time() - t0) / 10
        pairs = D * A * 27 * A
        print(f"{dt*1e3:8.2f} ms/call  {pairs/dt/1e9:7.2f} Gpairs/s")

    # oracle on one cell block
    xi = rp[0, :, PAD:PAD + CB]
    acc = np.zeros((A, CB), np.float32)
    for d in OFFSETS:
        xj = rp[0, :, PAD + d:PAD + d + CB]
        yj = rp[1, :, PAD + d:PAD + d + CB]
        zj = rp[2, :, PAD + d:PAD + d + CB]
        yi, zi = rp[1, :, PAD:PAD + CB], rp[2, :, PAD:PAD + CB]
        dx = xi[:, None, :] - xj[None, :, :]
        dy = yi[:, None, :] - yj[None, :, :]
        dz = zi[:, None, :] - zj[None, :, :]
        r2 = dx * dx + dy * dy + dz * dz
        mask = (r2 <= 29.0) & (r2 > 0)
        t2 = np.clip(r2, 4.0, 29.0) * np.float32(0.16) - np.float32(2.64)
        b0_, b1_ = np.zeros_like(t2), np.zeros_like(t2)
        for k in range(16, 0, -1):
            b0_, b1_ = t2 * b0_ - b1_ + np.float32(COEF[k]), b0_
        phi = 0.5 * t2 * b0_ - b1_ + np.float32(COEF[0])
        acc += np.sum(np.where(mask, phi, 0), axis=1, dtype=np.float32)
    err = np.max(np.abs(np.asarray(u)[:, :CB] - acc))
    print("u err:", err, "PROBE OK" if err < 2e-2 else "PROBE FAIL")


if __name__ == "__main__":
    main()
