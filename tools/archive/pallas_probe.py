"""Probe: does Mosaic (this TPU gen) accept the retiled stencil kernel's
core constructs?
  1. static unaligned lane slices of a VMEM scratch window
  2. [32,1,C] x [1,32,C] sublane-broadcast outer-product pair math
  3. reduction over the middle axis of [32,32,C]
Run: ./tools/tpu_gate.sh python tools/pallas_probe.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A, C, PAD = 32, 256, 300     # PAD deliberately not a multiple of 128
W = -(-(C + 2 * PAD) // 128) * 128   # DMA slice sizes must be lane-aligned
OFFSETS = (-300, -299, -1, 0, 1, 37, 299, 300)


def kernel(rp_ref, fx_ref, u_ref, win, sem):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(rp_ref.at[:, :, pl.ds(i * C, W)], win, sem)
    dma.start()
    dma.wait()

    CB = 128
    for b0 in range(0, C, CB):           # lane sub-blocks bound VMEM temps
        xi = win[0, :, PAD + b0:PAD + b0 + CB]          # [A, CB]
        yi = win[1, :, PAD + b0:PAD + b0 + CB]
        zi = win[2, :, PAD + b0:PAD + b0 + CB]
        fx = jnp.zeros((A, CB), jnp.float32)
        u = jnp.zeros((A, CB), jnp.float32)
        for d in OFFSETS:
            xj = win[0, :, PAD + b0 + d:PAD + b0 + d + CB]
            yj = win[1, :, PAD + b0 + d:PAD + b0 + d + CB]
            zj = win[2, :, PAD + b0 + d:PAD + b0 + d + CB]
            dx = xi[:, None, :] - xj[None, :, :]     # [A, A, CB]
            dy = yi[:, None, :] - yj[None, :, :]
            dz = zi[:, None, :] - zj[None, :, :]
            r2 = dx * dx + dy * dy + dz * dz
            mask = (r2 <= 36.0) & (r2 > 0)
            inv = jnp.where(mask, 1.0 / jnp.where(mask, r2, 1.0), 0.0)
            fx = fx + jnp.sum(inv * dx, axis=1)
            u = u + jnp.sum(jnp.where(mask, r2, 0.0), axis=1)
        fx_ref[:, b0:b0 + CB] = fx
        u_ref[:, b0:b0 + CB] = u


def main():
    D = 4 * C
    rng = np.random.RandomState(0)
    L = (D // C - 1) * C + W             # last chunk's window must fit
    rp = rng.uniform(0, 50, size=(3, A, L)).astype(np.float32)

    out = pl.pallas_call(
        kernel,
        grid=(D // C,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec((A, C), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((A, D), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((3, A, W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=len(sys.argv) > 1 and sys.argv[1] == "interp",
    )
    fx, u = out(rp)
    fx, u = np.asarray(fx), np.asarray(u)

    # numpy oracle
    fx_ref = np.zeros((A, D), np.float32)
    u_ref = np.zeros((A, D), np.float32)
    for d in OFFSETS:
        xi = rp[0, :, PAD:PAD + D]
        xj = rp[0, :, PAD + d:PAD + d + D]
        yi, yj = rp[1, :, PAD:PAD + D], rp[1, :, PAD + d:PAD + d + D]
        zi, zj = rp[2, :, PAD:PAD + D], rp[2, :, PAD + d:PAD + d + D]
        dx = xi[:, None, :] - xj[None, :, :]
        dy = yi[:, None, :] - yj[None, :, :]
        dz = zi[:, None, :] - zj[None, :, :]
        r2 = dx * dx + dy * dy + dz * dz
        mask = (r2 <= 36.0) & (r2 > 0)
        inv = np.where(mask, 1.0 / np.where(mask, r2, 1.0), 0.0)
        fx_ref += np.sum(inv * dx, axis=1, dtype=np.float32)
        u_ref += np.sum(np.where(mask, r2, 0), axis=1, dtype=np.float32)

    print("fx max err:", np.max(np.abs(fx - fx_ref)))
    print("u  max err:", np.max(np.abs(u - u_ref)))
    print("PROBE OK" if np.allclose(fx, fx_ref, atol=1e-3)
          and np.allclose(u, u_ref, rtol=1e-5, atol=1e-2) else "PROBE FAIL")


if __name__ == "__main__":
    main()
