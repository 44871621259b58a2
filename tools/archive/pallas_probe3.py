"""Probe 3: kernel-structure shootout with trustworthy (scan-marginal)
timing.  Variants:
  A: fori_loop over staged neighbor slabs, SSA accumulators (current)
  B: unrolled offsets, accumulate into the VMEM out-block refs (RMW)
  C: unrolled offsets, SSA accumulators (the VMEM-OOM variant, LJ-light)

Physics load approximates EAM pass1 (two deg-16 + one deg-15 Clenshaw).
Timing: kernel chained under lax.scan; per-call = (t_long - t_short)/(n_l -
n_s) so relay noise cancels.

Run: ./tools/tpu_gate.sh python tools/pallas_probe3.py [A|B|C] [lj]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A_, C, PAD = 32, 256, 553
CB = 128
W = -(-(C + 2 * PAD) // 128) * 128
rs = np.random.RandomState(1)
OFFSETS = tuple(sorted(rs.choice(np.arange(-PAD, PAD), 26,
                                 replace=False).tolist()) + [0])
COEF = tuple(np.random.RandomState(2).uniform(-1, 1, 17).tolist())
DCOEF = tuple(np.random.RandomState(3).uniform(-1, 1, 16).tolist())


def clenshaw(coef, t2):
    b0 = jnp.zeros_like(t2)
    b1 = jnp.zeros_like(t2)
    for k in range(len(coef) - 1, 0, -1):
        b0, b1 = t2 * b0 - b1 + np.float32(coef[k]), b0
    return np.float32(0.5) * t2 * b0 - b1 + np.float32(coef[0])


def physics(dx, dy, dz, lj):
    r2 = dx * dx + dy * dy + dz * dz
    mask = (r2 <= np.float32(29.0)) & (r2 > 0)
    if lj:
        inv = jnp.where(mask, 1.0 / jnp.where(mask, r2, 1.0), 0.0)
        r6 = inv * inv * inv
        fc = jnp.where(mask, r6 * inv * (12.0 * r6 - 6.0), 0.0)
        phi = jnp.where(mask, r6 * (r6 - 1.0), 0.0)
        rho = phi
    else:
        t2 = jnp.clip(r2, np.float32(4.0), np.float32(29.0)) * \
            np.float32(0.16) - np.float32(2.64)
        phi = clenshaw(COEF, t2)
        dphi = clenshaw(DCOEF, t2)
        rho = clenshaw(COEF[1:], t2)
        fc = jnp.where(mask, np.float32(-2.0) * dphi, 0.0)
        phi = jnp.where(mask, phi, 0.0)
        rho = jnp.where(mask, rho, 0.0)
    return fc, phi, rho


def kernel_A(rp_ref, fx_ref, u_ref, rho_ref, win, nbr, sem, *, lj):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        rp_ref.at[:, :, pl.ds(i * jnp.int32(C), W)], win, sem.at[jnp.int32(0)])
    dma.start()
    dma.wait()
    for b0 in range(0, C, CB):
        base = PAD + b0
        for k, d in enumerate(OFFSETS):
            nbr[k, :, :, :] = win[:, :, base + d:base + d + CB]
        xi = win[0, :, base:base + CB]
        yi = win[1, :, base:base + CB]
        zi = win[2, :, base:base + CB]

        def body(k, carry):
            fx, u, rho = carry
            dx = xi[:, None, :] - nbr[k, 0][None, :, :]
            dy = yi[:, None, :] - nbr[k, 1][None, :, :]
            dz = zi[:, None, :] - nbr[k, 2][None, :, :]
            fc, phi, rhov = physics(dx, dy, dz, lj)
            return (fx + jnp.sum(fc * dx, axis=1),
                    u + jnp.sum(phi, axis=1),
                    rho + jnp.sum(rhov, axis=1))

        z = jnp.zeros((A_, CB), jnp.float32)
        fx, u, rho = jax.lax.fori_loop(jnp.int32(0), jnp.int32(27), body,
                                       (z, z, z))
        fx_ref[:, b0:b0 + CB] = fx
        u_ref[:, b0:b0 + CB] = u
        rho_ref[:, b0:b0 + CB] = rho


def kernel_BC(rp_ref, fx_ref, u_ref, rho_ref, win, sem, *, lj, ref_acc):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        rp_ref.at[:, :, pl.ds(i * jnp.int32(C), W)], win, sem.at[jnp.int32(0)])
    dma.start()
    dma.wait()
    for b0 in range(0, C, CB):
        base = PAD + b0
        xi = win[0, :, base:base + CB]
        yi = win[1, :, base:base + CB]
        zi = win[2, :, base:base + CB]
        if ref_acc:
            fx_ref[:, b0:b0 + CB] = jnp.zeros((A_, CB), jnp.float32)
            u_ref[:, b0:b0 + CB] = jnp.zeros((A_, CB), jnp.float32)
            rho_ref[:, b0:b0 + CB] = jnp.zeros((A_, CB), jnp.float32)
        else:
            fx = jnp.zeros((A_, CB), jnp.float32)
            u = jnp.zeros((A_, CB), jnp.float32)
            rho = jnp.zeros((A_, CB), jnp.float32)
        for d in OFFSETS:
            dx = xi[:, None, :] - win[0, :, base + d:base + d + CB][None]
            dy = yi[:, None, :] - win[1, :, base + d:base + d + CB][None]
            dz = zi[:, None, :] - win[2, :, base + d:base + d + CB][None]
            fc, phi, rhov = physics(dx, dy, dz, lj)
            if ref_acc:
                fx_ref[:, b0:b0 + CB] += jnp.sum(fc * dx, axis=1)
                u_ref[:, b0:b0 + CB] += jnp.sum(phi, axis=1)
                rho_ref[:, b0:b0 + CB] += jnp.sum(rhov, axis=1)
            else:
                fx = fx + jnp.sum(fc * dx, axis=1)
                u = u + jnp.sum(phi, axis=1)
                rho = rho + jnp.sum(rhov, axis=1)
        if not ref_acc:
            fx_ref[:, b0:b0 + CB] = fx
            u_ref[:, b0:b0 + CB] = u
            rho_ref[:, b0:b0 + CB] = rho


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "A"
    lj = len(sys.argv) > 2 and sys.argv[2] == "lj"
    D = 8 * C
    n_chunks = D // C
    L = (n_chunks - 1) * C + W
    rng = np.random.RandomState(0)
    rp = rng.uniform(0, 40, size=(3, A_, L)).astype(np.float32)

    if variant == "A":
        kern = functools.partial(kernel_A, lj=lj)
        scratch = [pltpu.VMEM((3, A_, W), jnp.float32),
                   pltpu.VMEM((27, 3, A_, CB), jnp.float32),
                   pltpu.SemaphoreType.DMA((1,))]
    else:
        kern = functools.partial(kernel_BC, lj=lj, ref_acc=variant == "B")
        scratch = [pltpu.VMEM((3, A_, W), jnp.float32),
                   pltpu.SemaphoreType.DMA((1,))]

    call = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((A_, C), lambda i: (jnp.zeros_like(i), i),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((A_, D), jnp.float32)] * 3,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )

    def block(rp0, n):
        def step(rp, _):
            fx, u, rho = call(rp)
            # data dependency so scan can't collapse; cost ~1 op
            bump = (fx[0, 0] * np.float32(1e-30)).astype(jnp.float32)
            return rp + bump, ()

        out, _ = jax.lax.scan(step, rp0, None, length=n)
        return out

    b_s = jax.jit(functools.partial(block, n=4))
    b_l = jax.jit(functools.partial(block, n=20))
    float(jnp.sum(b_s(rp)))
    float(jnp.sum(b_l(rp)))
    print("compiled")
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        float(jnp.sum(b_s(rp)))
        ts = time.time() - t0
        t0 = time.time()
        float(jnp.sum(b_l(rp)))
        tl = time.time() - t0
        per = (tl - ts) / 16
        best = min(best, per)
        pairs = D * A_ * 27 * A_
        print(f"  {per*1e3:8.3f} ms/call  {pairs/per/1e9:7.2f} Gpairs/s")
    print(f"VARIANT {variant} {'LJ' if lj else 'EAM'} BEST "
          f"{best*1e3:.3f} ms  {D*A_*27*A_/best/1e9:.2f} Gpairs/s")


if __name__ == "__main__":
    main()
