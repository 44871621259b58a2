"""Pallas TPU kernel: LJ cell-pair force (the cta_cell analog).

Mapping from the reference CUDA kernel family (gpu_lj_cta_cell.h:29-122 —
one CTA per cell, neighbor positions staged through shared memory):

  * cells are laid out densely in 3D (x-fastest over the halo-extended
    grid), so all 27 neighbor cells of a contiguous run of C cells live in
    ONE contiguous window of the flat cell axis of width C + 2*(X*Y+X+1);
  * each grid step DMAs that window HBM->VMEM once (the shared-memory
    staging), then walks its C cells with static in-VMEM shifted views —
    no gathers anywhere;
  * per cell, the [A, 27A] pair block is evaluated on the VPU with the
    identical LJ math as ops/force_lj.py (ljForce.c:146-265 semantics).

Outputs per cell block: force [3, C, A] and unscaled pair energy [C, A]
(scaled by 4*eps outside, as the reference does at ljForce.c:256-261).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...cells import CellGeometry
from ..sweep import dense_maps


def _kernel(r_ref, fx_ref, fy_ref, fz_ref, u_ref, win, sem, *,
            C, W, A, pad, offsets, s6, eps4, e_shift, rcut2, sb):
    i = pl.program_id(0)
    start = i * C
    dma = pltpu.make_async_copy(r_ref.at[:, pl.ds(start, W), :], win, sem)
    dma.start()
    dma.wait()

    n_sub = C // sb

    def body(k, _):
        b0 = k * jnp.int32(sb)  # keep i32: x64 mode would make sb an i64
        # i-atoms for this sub-block: [sb*A] -> compute per box below
        for s in range(sb):
            b = b0 + jnp.int32(s)
            xi = win[0, pad + b, :]          # [A]
            yi = win[1, pad + b, :]
            zi = win[2, pad + b, :]
            # neighbor slab: 27 shifted row reads -> [A, 27A] pair block
            # (a [3, A] -> [3A] reshape would be cheaper but Mosaic rejects
            # that shape cast on this generation)
            xj = jnp.concatenate(
                [win[0, pad + b + d, :] for d in offsets])   # [27A]
            yj = jnp.concatenate(
                [win[1, pad + b + d, :] for d in offsets])
            zj = jnp.concatenate(
                [win[2, pad + b + d, :] for d in offsets])
            dx = xi[:, None] - xj[None, :]
            dy = yi[:, None] - yj[None, :]
            dz = zi[:, None] - zj[None, :]
            r2 = dx * dx + dy * dy + dz * dz
            mask = (r2 <= rcut2) & (r2 > 0)
            inv_r2 = jnp.where(mask, 1.0 / jnp.where(mask, r2, 1.0), 0.0)
            r6 = (s6 * inv_r2) * (inv_r2 * inv_r2)
            e = jnp.where(mask, r6 * (r6 - 1.0) - e_shift, 0.0)
            fc = jnp.where(mask, eps4 * r6 * inv_r2 * (12.0 * r6 - 6.0), 0.0)
            fx_ref[b, :] = jnp.sum(fc * dx, axis=-1)
            fy_ref[b, :] = jnp.sum(fc * dy, axis=-1)
            fz_ref[b, :] = jnp.sum(fc * dz, axis=-1)
            u_ref[b, :] = jnp.sum(e, axis=-1)
        return jnp.int32(0)

    # i32 bounds: under jax_enable_x64 python-int bounds make the loop index
    # i64, and Mosaic's i64->i32 conversion recurses infinitely
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_sub), body, jnp.int32(0))


def lj_force_pallas(geom: CellGeometry, pot, r, *, chunk: int = 256,
                    e_dtype=jnp.float64, interpret: bool = False):
    """Drop-in for ops.force_lj.lj_force via the Pallas kernel.

    Returns (force [3, n_local, A], U [n_local, A], ePot)."""
    A = r.shape[-1]
    dtype = r.dtype
    d_of_b, b_of_d, flat_offsets, pad = dense_maps(geom)
    D = len(b_of_d)
    C = min(chunk, D)
    n_chunks = -(-D // C)
    Dp = n_chunks * C
    rpad = pad + (Dp - D)
    W = C + pad + rpad if n_chunks == 1 else C + 2 * pad
    # the last chunk's window must stay in range: total rows = pad + Dp + ...
    total = pad + Dp + max(rpad, pad)

    rd = jnp.take(r, jnp.asarray(b_of_d), axis=1)
    sent_l = jnp.full((3, pad, A), dtype.type(1.0e10), dtype)
    sent_r = jnp.full((3, total - pad - D, A), dtype.type(1.0e10), dtype)
    rp = jnp.concatenate([sent_l, rd, sent_r], axis=1)

    import sys
    if sys.getrecursionlimit() < 10000:
        sys.setrecursionlimit(10000)  # Mosaic lowering recurses over the
        # unrolled kernel body and trips the default 1000 limit

    offsets = tuple(int(d) for d in flat_offsets)
    kern = functools.partial(
        _kernel, C=C, W=W, A=A, pad=pad, offsets=offsets,
        s6=dtype.type(pot.s6), eps4=dtype.type(4.0 * pot.epsilon),
        e_shift=dtype.type(pot.e_shift),
        rcut2=dtype.type(pot.cutoff * pot.cutoff), sb=min(8, C))

    fx, fy, fz, u = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((C, A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((Dp, A), dtype)] * 4,
        scratch_shapes=[
            pltpu.VMEM((3, W, A), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(rp)

    back = jnp.asarray(d_of_b[:geom.n_local])
    force = jnp.stack([jnp.take(fx, back, axis=0),
                       jnp.take(fy, back, axis=0),
                       jnp.take(fz, back, axis=0)])
    u_loc = jnp.take(u, back, axis=0)
    u_phys = (0.5 * 4.0 * pot.epsilon) * u_loc.astype(e_dtype)
    return force, u_phys.astype(dtype), jnp.sum(u_phys)
