"""Pallas TPU stencil kernel: the cell-pair force sweep (cta_cell analog).

TPU-native redesign of the reference CUDA kernel family
(gpu_lj_cta_cell.h:29-122, gpu_eam_cta_cell.h:34-75 -- one CTA per cell,
neighbor positions staged through shared memory):

  * cells are laid out densely in 3D (x-fastest over the halo-extended
    grid) and TRANSPOSED so the cell axis rides the 128 TPU lanes and the
    per-cell atom slots (A=32) ride sublanes: ``rp [3, A, L]``;
  * each grid step DMAs one contiguous lane window [3, A, W] HBM->VMEM
    (the shared-memory staging) covering a chunk of C cells plus the
    +/-pad dense overhang that contains all 27 neighbor cells;
  * every neighbor-cell read is then a *static lane-offset slice* of the
    VMEM window -- no gathers, no dynamic indexing anywhere;
  * the pair block for one neighbor offset is the sublane outer product
    [A_i, A_j, CB]: all-pairs between the i-atoms and j-atoms of CB cells
    at once, reduced over A_j on the VPU.

This layout is what round 1's kernel was missing: its [3, W, A=32] window
put atoms on lanes, so every neighbor read was a sub-tile row access that
Mosaic rejects ("input offsets outside of the first tile").  With cells on
lanes, all slices are full-height and Mosaic compiles it (verified on v5e;
tools/pallas_probe.py).

The same skeleton serves LJ and both EAM pair passes; only ``pair_fn``
changes (mirroring ops/sweep.py's design).
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

SENTINEL = 1.0e10


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(rp_ref, *refs, pair_fn, has_sj, n_scalars, C, CB, W, PAD,
            offsets):
    """Generic stencil sweep kernel body.

    refs order: [sj_ref] + fx,fy,fz + scalar outs + win, [sjwin], sems.

    The offsets loop is unrolled (the slices must be static) and
    accumulates into the VMEM out-block refs instead of SSA carries:
    Mosaic allocates stack for every live SSA value of an unrolled loop,
    so SSA accumulator chains through 27 Clenshaw-heavy iterations blow
    VMEM (186M measured); with ref accumulation each iteration's
    temporaries die at its end (measured 1.8x faster than the staged
    fori_loop variant as well, tools/pallas_probe3.py).
    """
    pos = 0
    sj_ref = None
    if has_sj:
        sj_ref = refs[pos]
        pos += 1
    out_f = refs[pos:pos + 3]
    pos += 3
    out_s = refs[pos:pos + n_scalars]
    pos += n_scalars
    win = refs[pos]
    pos += 1
    sjwin = None
    if has_sj:
        sjwin = refs[pos]
        pos += 1
    sem = refs[pos]

    start = pl.program_id(0) * jnp.int32(C)
    # index constants pinned to i32: under jax_enable_x64 python ints become
    # i64, which Mosaic's memref_slice rejects
    dma_r = pltpu.make_async_copy(
        rp_ref.at[:, :, pl.ds(start, W)], win, sem.at[jnp.int32(0)])
    dma_r.start()
    if has_sj:
        dma_s = pltpu.make_async_copy(
            sj_ref.at[:, pl.ds(start, W)], sjwin, sem.at[jnp.int32(1)])
        dma_s.start()
        dma_s.wait()
    dma_r.wait()

    A = win.shape[1]
    zero = jnp.zeros((A, CB), jnp.float32)
    for b0 in range(0, C, CB):
        base = PAD + b0
        xi = win[0, :, base:base + CB]           # [A, CB]
        yi = win[1, :, base:base + CB]
        zi = win[2, :, base:base + CB]
        sji = sjwin[:, base:base + CB][:, None, :] if has_sj else None
        for ref in (*out_f, *out_s):
            ref[:, b0:b0 + CB] = zero
        for d in offsets:
            xj = win[0, :, base + d:base + d + CB]
            yj = win[1, :, base + d:base + d + CB]
            zj = win[2, :, base + d:base + d + CB]
            dx = xi[:, None, :] - xj[None, :, :]   # [A, A, CB]
            dy = yi[:, None, :] - yj[None, :, :]
            dz = zi[:, None, :] - zj[None, :, :]
            r2 = dx * dx + dy * dy + dz * dz
            sjj = (sjwin[:, base + d:base + d + CB][None, :, :]
                   if has_sj else None)
            fc, scalars = pair_fn(r2, sji, sjj)
            out_f[0][:, b0:b0 + CB] += jnp.sum(fc * dx, axis=1)
            out_f[1][:, b0:b0 + CB] += jnp.sum(fc * dy, axis=1)
            out_f[2][:, b0:b0 + CB] += jnp.sum(fc * dz, axis=1)
            for k, s in enumerate(scalars):
                out_s[k][:, b0:b0 + CB] += jnp.sum(s, axis=1)


def stencil_sweep(
    geom: CellGeometry,
    r,                       # [3, B, A] positions, halo filled
    pair_fn,                 # (r2 [A,A,CB], sj_i, sj_j) -> (fc, [scalars])
    *,
    scalar_j=None,           # optional per-atom field [B, A] (EAM dfEmbed)
    n_scalars: int = 0,
    chunk: int = 512,
    cb: int = 128,
    interpret: bool = False,
):
    """Run the Pallas stencil sweep; returns (force [3,n_local,A], scalars).

    ``pair_fn`` runs INSIDE the kernel on f32 VMEM blocks: it receives the
    squared-distance pair block [A, A, CB] (i-slots x j-slots x cells) plus
    the optional per-atom field at i ([A, 1, CB]) and j ([1, A, CB]), and
    returns the force coefficient (multiplies dr = r_i - r_j, summed over
    j into the force on i) and ``n_scalars`` per-pair values summed over j.
    Empty slots carry SENTINEL coordinates; masking by r2 handles them.
    """
    if jnp.dtype(r.dtype) != jnp.float32:
        raise ValueError(
            "the Pallas stencil kernels run in float32 (Mosaic); use "
            "dtype='float32' or a non-cta_cell method for f64 dynamics")
    A = r.shape[-1]
    d_of_b, b_of_d, flat_offsets, pad = dense_maps(geom)
    D = len(b_of_d)

    C = min(chunk, _ceil_to(D, 128))
    CB = min(cb, C)
    C = _ceil_to(C, CB)      # the kernel's CB sub-block loop needs CB | C
    n_chunks = -(-D // C)
    Dp = n_chunks * C
    W = _ceil_to(C + 2 * pad, 128)
    L = (n_chunks - 1) * C + W

    # dense transposed layout: [3, A, L], cells on lanes
    rd = jnp.take(r, jnp.asarray(b_of_d), axis=1)        # [3, D, A]
    rp = jnp.full((3, A, L), jnp.float32(SENTINEL), jnp.float32)
    rp = jax.lax.dynamic_update_slice(
        rp, jnp.transpose(rd.astype(jnp.float32), (0, 2, 1)), (0, 0, pad))

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    operands = [rp]
    scratch = [pltpu.VMEM((3, A, W), jnp.float32)]
    if scalar_j is not None:
        sd = jnp.take(scalar_j, jnp.asarray(b_of_d), axis=0)  # [D, A]
        sp = jnp.zeros((A, L), jnp.float32)
        sp = jax.lax.dynamic_update_slice(
            sp, jnp.transpose(sd.astype(jnp.float32)), (0, pad))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(sp)
        scratch.append(pltpu.VMEM((A, W), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    n_out = 3 + n_scalars
    kern = functools.partial(
        _kernel, pair_fn=pair_fn, has_sj=scalar_j is not None,
        n_scalars=n_scalars, C=C, CB=CB, W=W, PAD=pad,
        offsets=tuple(int(d) for d in flat_offsets))

    outs = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=in_specs,
        # index map zero derived from i: a literal 0 is i64 under x64 mode,
        # which Mosaic's func.return rejects
        out_specs=[pl.BlockSpec((A, C), lambda i: (jnp.zeros_like(i), i),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((A, Dp), jnp.float32)] * n_out,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    back = jnp.asarray(d_of_b[:geom.n_local])
    force = jnp.stack([jnp.transpose(jnp.take(o, back, axis=1))
                       for o in outs[:3]])              # [3, n_local, A]
    scalars = [jnp.transpose(jnp.take(o, back, axis=1))
               for o in outs[3:]]
    return force, scalars


def _kernel_half(rp_ref, *refs, pair_fn, has_sj, n_scalars, C, CB, W, WJ,
                 PAD, offsets):
    """Half-shell stencil kernel: every unordered pair evaluated ONCE, with
    BOTH delivery sides accumulated from the same VMEM pair block.

    This is the fusion the XLA half sweep could not get (its i-side and
    j-side reductions split into separate fusions, each rematerializing the
    pair geometry -- docs/BENCHMARKS.md round 2): here the [A, A, CB] block
    and its table chains live once in VMEM and feed both reduces.

    refs order: [sj_ref] + (fx,fy,fz,scalars) i-side outs
                + (jfx,jfy,jfz,jscalars) j-side outs (width WJ = C+PAD spill)
                + win, [sjwin], sem.

    The window's 4th coordinate plane carries the pair-once counting rule
    (0 on LOCAL dense cells, BIG on halo rows): adding it to r2 voids all
    pairs whose i cell is a halo image, so each unordered pair survives in
    exactly one swept instance (i local, 13 positive offsets + triangular
    self-cell).  j contributions on halo rows are folded back to owners by
    the caller (the half-shell force exchange).
    """
    pos = 0
    sj_ref = None
    if has_sj:
        sj_ref = refs[pos]
        pos += 1
    n_out = 3 + n_scalars
    out_i = refs[pos:pos + n_out]
    pos += n_out
    out_j = refs[pos:pos + n_out]
    pos += n_out
    win = refs[pos]
    pos += 1
    sjwin = None
    if has_sj:
        sjwin = refs[pos]
        pos += 1
    sem = refs[pos]

    start = pl.program_id(0) * jnp.int32(C)
    dma_r = pltpu.make_async_copy(
        rp_ref.at[:, :, pl.ds(start, W)], win, sem.at[jnp.int32(0)])
    dma_r.start()
    if has_sj:
        dma_s = pltpu.make_async_copy(
            sj_ref.at[:, pl.ds(start, W)], sjwin, sem.at[jnp.int32(1)])
        dma_s.start()
        dma_s.wait()
    dma_r.wait()

    A = win.shape[1]
    for ref in out_j:
        ref[...] = jnp.zeros((A, WJ), jnp.float32)
    zero = jnp.zeros((A, CB), jnp.float32)
    for b0 in range(0, C, CB):
        base = PAD + b0
        xi = win[0, :, base:base + CB]           # [A, CB]
        yi = win[1, :, base:base + CB]
        zi = win[2, :, base:base + CB]
        ivi = win[3, :, base:base + CB]          # 0 local / BIG halo
        sji = sjwin[:, base:base + CB][:, None, :] if has_sj else None
        for ref in out_i:
            ref[:, b0:b0 + CB] = zero
        for d in offsets:
            xj = win[0, :, base + d:base + d + CB]
            yj = win[1, :, base + d:base + d + CB]
            zj = win[2, :, base + d:base + d + CB]
            dx = xi[:, None, :] - xj[None, :, :]   # [A, A, CB]
            dy = yi[:, None, :] - yj[None, :, :]
            dz = zi[:, None, :] - zj[None, :, :]
            r2 = dx * dx + dy * dy + dz * dz
            # pair-once counting: void halo-i rows; self-cell voids the
            # lower triangle + diagonal
            r2 = r2 + ivi[:, None, :]
            if d == 0:
                # triangular self-cell mask built in-kernel (iota), since
                # kernels may not capture array constants
                tri = (jax.lax.broadcasted_iota(jnp.int32, (A, A), 0)
                       < jax.lax.broadcasted_iota(jnp.int32, (A, A), 1))
                r2 = r2 + jnp.where(tri, np.float32(0.0),
                                    np.float32(1.0e30))[:, :, None]
            sjj = (sjwin[:, base + d:base + d + CB][None, :, :]
                   if has_sj else None)
            fc, scalars = pair_fn(r2, sji, sjj)
            fxp = fc * dx
            fyp = fc * dy
            fzp = fc * dz
            prods = (fxp, fyp, fzp, *scalars)
            for k, p in enumerate(prods):
                out_i[k][:, b0:b0 + CB] += jnp.sum(p, axis=1)
            jd = b0 + d
            for k, p in enumerate(prods):
                sgn = -1.0 if k < 3 else 1.0
                out_j[k][:, jd:jd + CB] += sgn * jnp.sum(p, axis=0)


def stencil_sweep_half(
    geom: CellGeometry,
    r,                       # [3, B, A] positions, halo filled
    pair_fn,                 # (r2 [A,A,CB], sj_i, sj_j) -> (fc, [scalars])
    *,
    scalar_j=None,
    n_scalars: int = 0,
    chunk: int = 512,
    cb: int = 128,
    interpret: bool = False,
):
    """Pallas half-shell sweep; returns DENSE-side contributions
    (force [3, n_total, A], scalars [n_total, A]) with halo rows pending the
    caller's fold (fold_halo_serial / exchange.fold_halo), mirroring
    ops.sweep.cell_pair_sweep_half's contract.

    ``pair_fn`` must deliver symmetric scalars (phi, rho): the j side
    receives the same per-pair value, the force the negated one (Newton's
    3rd law).  Empty slots carry SENTINEL coordinates; self/halo-i pairs
    are voided by a BIG addend on r2 before ``pair_fn`` sees it.
    """
    from ..sweep import is_local_dense
    if jnp.dtype(r.dtype) != jnp.float32:
        raise ValueError(
            "the Pallas stencil kernels run in float32 (Mosaic); use "
            "dtype='float32' or a non-cta_cell method for f64 dynamics")
    A = r.shape[-1]
    d_of_b, b_of_d, flat_offsets, pad = dense_maps(geom)
    D = len(b_of_d)
    offsets = (0,) + tuple(sorted(int(d) for d in flat_offsets if d > 0))

    C = min(chunk, _ceil_to(D, 128))
    CB = min(cb, C)
    C = _ceil_to(C, CB)      # the kernel's CB sub-block loop needs CB | C
    n_chunks = -(-D // C)
    Dp = n_chunks * C
    W = _ceil_to(C + 2 * pad, 128)
    WJ = _ceil_to(C + pad, 128)   # j spill: offsets reach (C-CB)+pad+CB
    L = (n_chunks - 1) * C + W

    # dense transposed layout [4, A, L]: 3 coordinate planes + the
    # locality plane (0 = local cell, BIG = halo image)
    BIG = np.float32(1.0e30)
    rd = jnp.take(r, jnp.asarray(b_of_d), axis=1)        # [3, D, A]
    iv = is_local_dense(geom)                            # [D] bool
    ivp = jnp.where(jnp.asarray(iv), np.float32(0.0), BIG)
    ivp = jnp.broadcast_to(ivp[None, :], (A, D))
    rp = jnp.full((4, A, L), jnp.float32(SENTINEL), jnp.float32)
    rp = jax.lax.dynamic_update_slice(
        rp, jnp.transpose(rd.astype(jnp.float32), (0, 2, 1)), (0, 0, pad))
    rp = jax.lax.dynamic_update_slice(rp, ivp[None], (3, 0, pad))

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    operands = [rp]
    scratch = [pltpu.VMEM((4, A, W), jnp.float32)]
    if scalar_j is not None:
        sd = jnp.take(scalar_j, jnp.asarray(b_of_d), axis=0)  # [D, A]
        sp = jnp.zeros((A, L), jnp.float32)
        sp = jax.lax.dynamic_update_slice(
            sp, jnp.transpose(sd.astype(jnp.float32)), (0, pad))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(sp)
        scratch.append(pltpu.VMEM((A, W), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    n_out = 3 + n_scalars
    kern = functools.partial(
        _kernel_half, pair_fn=pair_fn, has_sj=scalar_j is not None,
        n_scalars=n_scalars, C=C, CB=CB, W=W, WJ=WJ, PAD=pad,
        offsets=offsets)

    out_specs = (
        [pl.BlockSpec((A, C), lambda i: (jnp.zeros_like(i), i),
                      memory_space=pltpu.VMEM)] * n_out
        + [pl.BlockSpec((A, WJ), lambda i: (jnp.zeros_like(i), i),
                        memory_space=pltpu.VMEM)] * n_out)
    out_shape = ([jax.ShapeDtypeStruct((A, Dp), jnp.float32)] * n_out
                 + [jax.ShapeDtypeStruct((A, n_chunks * WJ), jnp.float32)]
                 * n_out)

    outs = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    # overlap-add: i-side lands on chunk-aligned lanes; each chunk's j
    # spill [A, WJ] belongs at dense offset k*C (j lanes k*C .. k*C+WJ)
    n_seg = -(-WJ // C)
    dense = [jnp.pad(o, ((0, 0), (0, n_seg * C))) for o in outs[:n_out]]
    jouts = [o.reshape(A, n_chunks, WJ) for o in outs[n_out:]]
    for s in range(n_seg):
        w0 = s * C
        wid = min(C, WJ - w0)
        for k in range(n_out):
            seg = jouts[k][:, :, w0:w0 + wid]          # [A, n_chunks, wid]
            seg = jnp.pad(seg, ((0, 0), (0, 0), (0, C - wid))).reshape(
                A, Dp)
            dense[k] = dense[k].at[:, w0:w0 + Dp].add(seg)
    dense = [d[:, :D] for d in dense]

    back_all = jnp.asarray(d_of_b)                      # local + halo boxes
    force = jnp.stack([jnp.transpose(jnp.take(d, back_all, axis=1))
                       for d in dense[:3]])             # [3, n_total, A]
    scalars = [jnp.transpose(jnp.take(d, back_all, axis=1))
               for d in dense[3:]]
    return force, scalars


# ---------------------------------------------------------------------------
# LJ physics (ljForce.c:146-265 semantics, identical to ops/force_lj.py)
# ---------------------------------------------------------------------------

def _lj_pair(pot, want_energy: bool = True):
    s6 = np.float32(pot.s6)
    eps4 = np.float32(4.0 * pot.epsilon)
    e_shift = np.float32(pot.e_shift)
    rcut2 = np.float32(pot.cutoff * pot.cutoff)

    def pair(r2, sji, sjj):
        mask = (r2 <= rcut2) & (r2 > 0)
        inv_r2 = jnp.where(mask, 1.0 / jnp.where(mask, r2, 1.0), 0.0)
        r6 = (s6 * inv_r2) * (inv_r2 * inv_r2)
        fc = jnp.where(mask, eps4 * r6 * inv_r2 * (12.0 * r6 - 6.0), 0.0)
        if not want_energy:
            return fc, []
        e = jnp.where(mask, r6 * (r6 - 1.0) - e_shift, 0.0)
        return fc, [e]

    return pair


def lj_force_stencil(geom: CellGeometry, pot, r, *, chunk: int = 512,
                     cb: int = 128, e_dtype=jnp.float64,
                     interpret: bool = False, want_energy: bool = True):
    """Drop-in for ops.force_lj.lj_force via the Pallas stencil kernel.

    Returns (force [3, n_local, A], U [n_local, A], ePot).
    """
    n_s = 1 if want_energy else 0
    force, scal = stencil_sweep(geom, r, _lj_pair(pot, want_energy),
                                n_scalars=n_s, chunk=chunk,
                                cb=cb, interpret=interpret)
    if not want_energy:
        return force.astype(r.dtype), None, None
    u = (0.5 * 4.0 * pot.epsilon) * scal[0].astype(e_dtype)
    return force.astype(r.dtype), u, jnp.sum(u)


def lj_force_stencil_half(geom: CellGeometry, pot, r, fold, *,
                          chunk: int = 512, cb: int = 128,
                          e_dtype=jnp.float64, interpret: bool = False,
                          want_energy: bool = True):
    """LJ via the Pallas half-shell kernel (pair-once, dual delivery).

    ``fold`` maps dense [..., n_total, A] contributions to
    [..., n_local, A] (the half-shell force exchange).
    Returns (force [3, n_local, A], U [n_local, A], ePot).
    """
    n_s = 1 if want_energy else 0
    force_d, scal_d = stencil_sweep_half(
        geom, r, _lj_pair(pot, want_energy), n_scalars=n_s, chunk=chunk,
        cb=cb, interpret=interpret)
    force = fold(force_d).astype(r.dtype)
    if not want_energy:
        return force, None, None
    # e delivered to both sides -> the atom sum double-counts pairs exactly
    # as the full sweep does -> same 0.5 * 4eps scaling
    u = (0.5 * 4.0 * pot.epsilon) * fold(scal_d[0]).astype(e_dtype)
    return force, u, jnp.sum(u)


# ---------------------------------------------------------------------------
# EAM physics: Chebyshev-in-r^2 evaluators inside the kernel
# ---------------------------------------------------------------------------

def eam_pass1_stencil(geom: CellGeometry, pot, r, *, chunk: int = 512,
                      cb: int = 128, interpret: bool = False,
                      want_energy: bool = True, half: bool = False):
    """EAM pass 1 (gpu_eam_cta_cell.h:34-75 analog): pair energy, electron
    density accumulation and pair force, with the phi/rho table lookups as
    the in-kernel shared-basis Chebyshev evaluator (tables.ChebFused --
    the same representation as the XLA cheb sweep, so the two paths agree
    to fp-reassociation).

    Returns (f1 [3, n_local, A], phi_sum [n_local, A], rhobar [n_local, A]).
    """
    from ...potentials import tables
    fz = pot.cheb_pair
    rcut2 = np.float32(pot.cutoff * pot.cutoff)

    def pair(r2, sji, sjj):
        mask = (r2 <= rcut2) & (r2 > 0)
        if want_energy:
            phi, dphi, rho = tables.eval_cheb_fused(
                fz, r2, [("phi", "val"), ("phi", "der"), ("rho", "val")])
        else:
            dphi, rho = tables.eval_cheb_fused(
                fz, r2, [("phi", "der"), ("rho", "val")])
        fc = jnp.where(mask, -dphi, 0.0)
        scal = [jnp.where(mask, rho, 0.0)]
        if want_energy:
            scal.insert(0, jnp.where(mask, phi, 0.0))
        return fc, scal

    sweep = stencil_sweep_half if half else stencil_sweep
    n_s = 2 if want_energy else 1
    f1, scal = sweep(geom, r, pair, n_scalars=n_s, chunk=chunk, cb=cb,
                     interpret=interpret)
    phi_sum, rhobar = scal if want_energy else (None, scal[0])
    return f1, phi_sum, rhobar


def eam_pass3_stencil(geom: CellGeometry, pot, r, df_embed, *,
                      chunk: int = 512, cb: int = 128,
                      interpret: bool = False, half: bool = False):
    """EAM pass 3: embedding force  f_i -= (dfe_i + dfe_j) * rho'(r) * rhat,
    expressed gather-free as fc = -(dfe_i + dfe_j) * (1/r) dRho/dr.

    ``df_embed`` is the halo-exchanged [B, A] dfEmbed field (eam.c:374-413).
    Returns f3 [3, n_local, A].
    """
    from ...potentials import tables
    fz = pot.cheb_pair
    rcut2 = np.float32(pot.cutoff * pot.cutoff)

    def pair(r2, sji, sjj):
        mask = (r2 <= rcut2) & (r2 > 0)
        (drho,) = tables.eval_cheb_fused(fz, r2, [("rho", "der")])
        fc = jnp.where(mask, -(sji + sjj) * drho, 0.0)
        return fc, []

    sweep = stencil_sweep_half if half else stencil_sweep
    f3, _ = sweep(geom, r, pair, scalar_j=df_embed, n_scalars=0,
                  chunk=chunk, cb=cb, interpret=interpret)
    return f3
