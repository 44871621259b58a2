"""Chunked 27-neighbor-cell pair sweep (the XLA force-path workhorse).

TPU-native replacement for the reference's thread_atom/cta_cell CUDA kernels
(src-mpi/gpu_lj_thread_atom.h:31-143, gpu_eam_thread_atom.h:32-140): instead
of one CUDA thread per atom walking 27 cells, we materialize the pair geometry
for a *chunk* of cells at a time -- [C, A, 27A] displacement tensors -- and
let the VPU reduce over the j axis.  `lax.map` over chunks bounds peak memory;
empty slots carry a far-away sentinel coordinate so the cutoff mask removes
them without per-cell occupancy branches.

The same sweep skeleton serves LJ and all three EAM passes; only the
``pair_fn`` (per-pair physics) changes.
"""
from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cells import CellGeometry


def dense_maps(geom: CellGeometry):
    """Static maps between the reference cell numbering and a dense 3D
    numbering (x-fastest over the halo-extended grid), used by the
    shifted-slice sweep.

    Returns (dense_of_box [n_total], box_of_dense [D], flat_offsets [27],
    pad) where D = (gx+2)(gy+2)(gz+2), dense id = (ix+1) + X*(iy+1) +
    X*Y*(iz+1), and pad is the slice padding that keeps all 27 shifted
    views in range.
    """
    gx, gy, gz = geom.grid
    X, Y, Z = gx + 2, gy + 2, gz + 2
    t = geom.tuple_of_box  # [n_total, 3] in [-1 .. g]
    dense_of_box = ((t[:, 0] + 1) + X * (t[:, 1] + 1) +
                    X * Y * (t[:, 2] + 1)).astype(np.int32)
    box_of_dense = np.zeros((X * Y * Z,), np.int32)
    box_of_dense[dense_of_box] = np.arange(geom.n_total, dtype=np.int32)
    offs = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                indexing="ij"), axis=-1).reshape(27, 3)
    flat_offsets = offs[:, 0] + X * offs[:, 1] + X * Y * offs[:, 2]
    pad = int(X * Y + X + 1)
    return dense_of_box, box_of_dense, flat_offsets.astype(int), pad


def cell_pair_sweep_dense(
    geom: CellGeometry,
    r: jnp.ndarray,                    # [3, B, A]
    pair_fn: Callable,
    rcut2: float,
    *,
    scalar_j: Sequence[jnp.ndarray] = (),
    chunk: int = 256,
    want_force: bool = True,
    fetch: str = "slices",
    flat_out: bool = False,
):
    """Gather-free variant of cell_pair_sweep: cells are laid out densely in
    3D so each of the 27 neighbor views is a *static shifted slice* of the
    flat cell axis -- the TPU-idiomatic stencil formulation (no dynamic
    gathers, which XLA lowers poorly at scale).  i-compute runs over the
    z-interior slab of the dense grid (x/y halo rows included,
    ~(X·Y)/(gx·gy) overhead; the z halo planes are j-only) and results are
    permuted back to the reference numbering.

    ``fetch`` selects the per-chunk j delivery:

    - ``"slices"``: 27 separate dynamic slices of the dense array (one per
      stencil offset) -- 27·C rows of fetch traffic per chunk.
    - ``"window"``: ONE dynamic slice of ``C + 2·pad`` contiguous rows (the
      union of all 27 shifted views, which differ by at most ±pad), then 27
      *static* in-window slices.  Cuts per-chunk fetch traffic ~27C/(C+2pad)
      -- ~5.5x at the 63³ headline -- attacking the per-chunk fixed overhead
      that is the residual A<32 cost (docs/BENCHMARKS.md round 3c).
    - ``"window_flat"``: as window, but the dense array is kept FLAT
      ([3, L·A]) in HBM and the window is one [3, W·A] lane-contiguous
      slice reshaped to [3, W, A] in VMEM.  A [*, A] minor axis is
      physically lane-padded A→128 on TPU, so the padded window moves
      128/A× the real bytes; the flat form removes that 8x (A=16) tax
      from the fetch entirely.

    ``flat_out=True`` applies the same idea to the chunk RESULTS: the body
    returns [3, C·A]/[C·A] lane-flat blocks, so the lax.map-stacked
    intermediate is written and re-read unpadded (one relayout at the end
    restores [.., A]-minor for the caller).
    """
    A = r.shape[-1]
    dtype = r.dtype
    d_of_b, b_of_d, flat_offsets, pad = dense_maps(geom)
    D = len(b_of_d)
    gx, gy, gz = geom.grid
    XY = (gx + 2) * (gy + 2)
    z0 = XY                       # first dense row of the z-interior slab
    span = XY * gz                # rows holding every local cell

    chunk = min(chunk, span)      # small grids: no oversized round-up
    n_chunks = -(-span // chunk)
    Dp = n_chunks * chunk
    rpad = pad + max(0, z0 + Dp - D)  # right pad absorbs the chunk round-up

    # one row-permutation into dense order + sentinel padding
    rd = jnp.take(r, jnp.asarray(b_of_d), axis=1)          # [3, D, A]
    sent_l = jnp.full((3, pad, A), dtype.type(1.0e10), dtype=dtype)
    sent_r = jnp.full((3, rpad, A), dtype.type(1.0e10), dtype=dtype)
    rp = jnp.concatenate([sent_l, rd, sent_r], axis=1)
    sp = []
    for s in scalar_j:
        sd = jnp.take(s, jnp.asarray(b_of_d), axis=0)
        sp.append(jnp.concatenate(
            [jnp.zeros((pad, A), s.dtype), sd,
             jnp.zeros((rpad, A), s.dtype)], axis=0))

    W = chunk + 2 * pad               # window rows covering all 27 views
    if fetch == "window_flat":
        rp_f = rp.reshape(3, -1)
        sp_f = [s.reshape(-1) for s in sp]

    # "window_g": lane-grouped pair tensors.  The [C, A, 27A] tensor's
    # minor axis (27A = 432 at A=16) pads physically to 512 lanes; cutting
    # the 27 offsets into groups of G = 128//A j-cells gives [C, A, 128]
    # blocks with zero lane pad per group (the cell_pair_sweep_half:414
    # trick applied to the full sweep -- VERDICT r3 item 2b).  ceil(27/G)
    # groups -> the last group still pads (27 mod G), so the total padded
    # lanes stay 512 at A=16; measured to decide whether the per-group
    # layout wins anyway.
    G = max(1, 128 // A)
    off_groups = [list(flat_offsets)[g:g + G]
                  for g in range(0, 27, G)]

    def body(c0):
        if fetch == "window_g":
            w = jax.lax.dynamic_slice_in_dim(rp, z0 + c0, W, axis=1)
            ri = jax.lax.slice_in_dim(w, pad, pad + chunk, axis=1)
            ws = [jax.lax.dynamic_slice_in_dim(s, z0 + c0, W, axis=0)
                  for s in sp]
            si = [jax.lax.slice_in_dim(v, pad, pad + chunk, axis=0)[:, :, None]
                  for v in ws]
            acc = None
            for grp in off_groups:
                rj = jnp.concatenate(
                    [jax.lax.slice_in_dim(w, pad + int(d),
                                          pad + int(d) + chunk, axis=1)
                     for d in grp], axis=-1)                # [3, C, G'A]
                dr = ri[:, :, :, None] - rj[:, :, None, :]
                r2 = dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2]
                mask = (r2 <= dtype.type(rcut2)) & (r2 > 0)
                sjg = [jnp.concatenate(
                    [jax.lax.slice_in_dim(v, pad + int(d),
                                          pad + int(d) + chunk, axis=0)
                     for d in grp], axis=-1)[:, None, :] for v in ws]
                fcoef, scalars = pair_fn(r2, mask, sjg, si)
                operands = []
                if want_force:
                    operands.extend(fcoef * dr[a] for a in range(3))
                operands.extend(scalars)
                zero = r2.dtype.type(0)
                red = jax.lax.reduce(
                    tuple(operands), (zero,) * len(operands),
                    lambda a_, x: tuple(u + v for u, v in zip(a_, x)), (2,))
                acc = list(red) if acc is None else \
                    [u + v for u, v in zip(acc, red)]
            outs = []
            i = 0
            if want_force:
                f = jnp.stack(acc[:3])
                outs.append(f.reshape(3, chunk * A) if flat_out else f)
                i = 3
            outs.extend(x.reshape(chunk * A) if flat_out else x
                        for x in acc[i:])
            return tuple(outs)
        if fetch == "window_flat":
            w = jax.lax.dynamic_slice_in_dim(
                rp_f, (z0 + c0) * A, W * A, axis=1).reshape(3, W, A)
            ri = jax.lax.slice_in_dim(w, pad, pad + chunk, axis=1)
            rjs = [jax.lax.slice_in_dim(w, pad + int(d),
                                        pad + int(d) + chunk, axis=1)
                   for d in flat_offsets]
        elif fetch == "window":
            # rp row (z0 + c0) is absolute slab row (z0 + c0 - pad); the
            # view at stencil offset d starts at in-window row (pad + d),
            # a STATIC index (d in [-pad, pad] -> [0, 2*pad]).
            w = jax.lax.dynamic_slice_in_dim(rp, z0 + c0, W, axis=1)
            ri = jax.lax.slice_in_dim(w, pad, pad + chunk, axis=1)
            rjs = [jax.lax.slice_in_dim(w, pad + int(d),
                                        pad + int(d) + chunk, axis=1)
                   for d in flat_offsets]
        else:
            ri = jax.lax.dynamic_slice_in_dim(rp, pad + z0 + c0, chunk,
                                              axis=1)
            rjs = [jax.lax.dynamic_slice_in_dim(rp, pad + z0 + c0 + int(d),
                                                chunk, axis=1)
                   for d in flat_offsets]
        rj = jnp.concatenate(rjs, axis=-1)                 # [3, C, 27A]
        dr = ri[:, :, :, None] - rj[:, :, None, :]         # [3, C, A, 27A]
        r2 = dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2]
        mask = (r2 <= dtype.type(rcut2)) & (r2 > 0)
        sj = []
        si = []
        for k, s in enumerate(sp):
            if fetch == "window_flat":
                ws = jax.lax.dynamic_slice_in_dim(
                    sp_f[k], (z0 + c0) * A, W * A).reshape(W, A)
                ss = [jax.lax.slice_in_dim(ws, pad + int(d),
                                           pad + int(d) + chunk, axis=0)
                      for d in flat_offsets]
                s_i = jax.lax.slice_in_dim(ws, pad, pad + chunk, axis=0)
            elif fetch == "window":
                ws = jax.lax.dynamic_slice_in_dim(s, z0 + c0, W, axis=0)
                ss = [jax.lax.slice_in_dim(ws, pad + int(d),
                                           pad + int(d) + chunk, axis=0)
                      for d in flat_offsets]
                s_i = jax.lax.slice_in_dim(ws, pad, pad + chunk, axis=0)
            else:
                ss = [jax.lax.dynamic_slice_in_dim(
                          s, pad + z0 + c0 + int(d), chunk, axis=0)
                      for d in flat_offsets]
                s_i = jax.lax.dynamic_slice_in_dim(
                    s, pad + z0 + c0, chunk, axis=0)
            sj.append(jnp.concatenate(ss, axis=-1).reshape(chunk, 1, 27 * A))
            si.append(s_i[:, :, None])
        fcoef, scalars = pair_fn(r2, mask, sj, si)
        # one variadic reduce over j, as in cell_pair_sweep: keeps the
        # shared per-pair chains in a single fusion
        operands = []
        if want_force:
            operands.extend(fcoef * dr[a] for a in range(3))
        operands.extend(scalars)
        zero = r2.dtype.type(0)
        red = jax.lax.reduce(
            tuple(operands), (zero,) * len(operands),
            lambda acc, x: tuple(a + b for a, b in zip(acc, x)), (2,))
        outs = []
        i = 0
        if want_force:
            f = jnp.stack(red[:3])
            outs.append(f.reshape(3, chunk * A) if flat_out else f)
            i = 3
        outs.extend(x.reshape(chunk * A) if flat_out else x
                    for x in red[i:])
        return tuple(outs)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    results = jax.lax.map(body, starts)

    back = jnp.asarray(d_of_b[:geom.n_local] - z0)  # rows relative to slab
    out = []
    i = 0
    if want_force:
        f = jnp.moveaxis(results[0], 1, 0).reshape(3, Dp, A)
        out.append(jnp.take(f, back, axis=1))              # [3, n_local, A]
        i = 1
    for res in results[i:]:
        out.append(jnp.take(res.reshape(Dp, A), back, axis=0))
    force = out[0] if want_force else None
    scalars = out[1:] if want_force else out
    return force, scalars


def cell_pair_sweep_dense_t(
    geom: CellGeometry,
    r: jnp.ndarray,                    # [3, B, A]
    pair_fn: Callable,
    rcut2: float,
    *,
    scalar_j: Sequence[jnp.ndarray] = (),
    chunk: int = 256,
    want_force: bool = True,
):
    """TRANSPOSED dense stencil sweep: cells ride the minor (lane) axis.

    Motivation (measured, round 3): the [B, A] state layout pads the minor
    A axis to 128 lanes physically, so the gather-form sweep's 27x j-fetch
    moves 128/A times the real data -- hidden under pair compute at A=32
    (k=4 cells) but EXPOSED at A=16 (k=3), costing ~1.9x per slot pair.
    Here positions are transposed ONCE per pass to [3, A, D] (A=16/32 pads
    to a clean 8-multiple sublane count, D is the dense-extended cell axis
    on lanes), every neighbor view is a static shifted slice along the
    minor axis, and the pair tensor is [A_i, 27*A_j, C] with C cells on
    lanes -- the layout of the Pallas stencil kernels (ops/pallas/
    stencil.py), but in pure XLA where the round-2 Mosaic relayout tax
    does not apply.

    Same contract as cell_pair_sweep (local boxes, reference order).
    """
    A = r.shape[-1]
    dtype = r.dtype
    d_of_b, b_of_d, flat_offsets, pad = dense_maps(geom)
    D = len(b_of_d)

    C = min(chunk, D)
    n_chunks = -(-D // C)
    Dp = n_chunks * C
    rpad = pad + (Dp - D)

    # one transpose into cells-on-lanes order + sentinel padding
    rd = jnp.take(r, jnp.asarray(b_of_d), axis=1)          # [3, D, A]
    rt = jnp.transpose(rd, (0, 2, 1))                      # [3, A, D]
    sent_l = jnp.full((3, A, pad), dtype.type(1.0e10), dtype=dtype)
    sent_r = jnp.full((3, A, rpad), dtype.type(1.0e10), dtype=dtype)
    rp = jnp.concatenate([sent_l, rt, sent_r], axis=2)     # [3, A, pad+Dp+pad']
    sp = []
    for s in scalar_j:
        sd = jnp.transpose(jnp.take(s, jnp.asarray(b_of_d), axis=0))
        sp.append(jnp.concatenate(
            [jnp.zeros((A, pad), s.dtype), sd,
             jnp.zeros((A, rpad), s.dtype)], axis=1))      # [A, ...]

    def body(c0):
        ri = jax.lax.dynamic_slice_in_dim(rp, pad + c0, C, axis=2)
        rjs = [jax.lax.dynamic_slice_in_dim(rp, pad + c0 + int(d), C, axis=2)
               for d in flat_offsets]
        rj = jnp.concatenate(rjs, axis=1)                  # [3, 27A, C]
        dr = ri[:, :, None, :] - rj[:, None, :, :]         # [3, A, 27A, C]
        r2 = dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2]
        mask = (r2 <= dtype.type(rcut2)) & (r2 > 0)
        sj = []
        si = []
        for s in sp:
            ss = [jax.lax.dynamic_slice_in_dim(s, pad + c0 + int(d), C,
                                               axis=1)
                  for d in flat_offsets]
            sj.append(jnp.concatenate(ss, axis=0)[None, :, :])  # [1,27A,C]
            si.append(jax.lax.dynamic_slice_in_dim(
                s, pad + c0, C, axis=1)[:, None, :])            # [A,1,C]
        fcoef, scalars = pair_fn(r2, mask, sj, si)

        operands = []
        if want_force:
            operands.extend(fcoef * dr[a] for a in range(3))
        operands.extend(scalars)
        zero = r2.dtype.type(0)
        red = jax.lax.reduce(
            tuple(operands), (zero,) * len(operands),
            lambda acc, x: tuple(a + b for a, b in zip(acc, x)),
            (1,))                                          # sum over 27A_j

        outs = []
        i = 0
        if want_force:
            outs.append(jnp.stack(red[:3]))                # [3, A, C]
            i = 3
        outs.extend(red[i:])                               # each [A, C]
        return tuple(outs)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * C
    results = jax.lax.map(body, starts)

    back = jnp.asarray(d_of_b[:geom.n_local])
    out = []
    i = 0
    if want_force:
        # [n_chunks, 3, A, C] -> [3, A, n_chunks*C] -> [3, Dp, A]
        f = jnp.moveaxis(results[0], 0, 2).reshape(3, A, Dp)
        f = jnp.transpose(f, (0, 2, 1))
        out.append(jnp.take(f, back, axis=1))
        i = 1
    for res in results[i:]:
        # [n_chunks, A, C] -> [A, n_chunks*C] -> [Dp, A]
        s = jnp.moveaxis(res, 0, 1).reshape(A, Dp)
        out.append(jnp.take(jnp.transpose(s), back, axis=0))
    force = out[0] if want_force else None
    scalars = out[1:] if want_force else out
    return force, scalars


def sweep_dispatch(sweep_impl: str) -> Callable:
    """Map a ``sweep_impl`` name to its sweep callable (shared by the LJ
    and EAM force paths)."""
    table = {
        "gather": cell_pair_sweep,
        "dense": cell_pair_sweep_dense,
        "dense_w": functools.partial(cell_pair_sweep_dense, fetch="window"),
        "dense_wg": functools.partial(cell_pair_sweep_dense,
                                      fetch="window_g"),
        "dense_wf": functools.partial(cell_pair_sweep_dense,
                                      fetch="window_flat"),
        "dense_f": functools.partial(cell_pair_sweep_dense,
                                     fetch="window_flat", flat_out=True),
        "dense_t": cell_pair_sweep_dense_t,
    }
    if sweep_impl not in table:
        raise ValueError(f"unknown sweep_impl {sweep_impl!r}; "
                         f"choose one of {sorted(table)} or 'auto'")
    return table[sweep_impl]


def is_local_dense(geom: CellGeometry) -> np.ndarray:
    """[D] flag: dense row holds a LOCAL cell (not a halo image)."""
    d_of_b, b_of_d, _, _ = dense_maps(geom)
    flag = np.zeros(len(b_of_d), dtype=bool)
    flag[d_of_b[:geom.n_local]] = True
    return flag


def cell_pair_sweep_half(
    geom: CellGeometry,
    r: jnp.ndarray,                    # [3, B, A]
    pair_fn: Callable,
    rcut2: float,
    *,
    scalar_j: Sequence[jnp.ndarray] = (),
    chunk: int = 512,
    want_force: bool = True,
    fetch: str = "slices",
    materialize: bool = False,
):
    """Newton's-3rd-law half sweep: every unordered pair evaluated ONCE.

    The reference's half-neighbor-list kernels scatter to both atoms
    (ljForce.c:146-265, eam.c:266-419); scatters are poison on TPU, so the
    j-side delivery becomes an *overlap-add of statically shifted slices*
    in the dense cell layout: for each of the 13 positive flat offsets d,
    the j contributions of a chunk of C cells form a [C, A] block that
    belongs d lanes downstream -- accumulated into a per-chunk staging
    buffer at static offset d, then overlap-added across chunks.  The
    self-cell (d=0) uses a triangular slot mask.

    Pair-once counting rule: only LOCAL dense rows act as i (halo images
    are j-only).  Each unordered pair then has exactly one swept instance,
    and contributions accumulated on halo rows belong to the owning cell:
    the caller MUST fold them back (fold_halo_serial, or
    parallel.exchange.fold_halo over a mesh -- the half-shell force
    exchange the reference ships as part of its EAM/LJ kernel family).

    ``pair_fn`` has the cell_pair_sweep contract; its scalar outputs are
    delivered symmetrically to BOTH sides (phi, rho are symmetric), its
    fcoef to i as +fcoef*dr and to j as -fcoef*dr.

    ``fetch`` selects the per-chunk j delivery (see cell_pair_sweep_dense):
    ``"slices"`` issues one dynamic slice per stencil offset (14 per
    chunk); ``"window"`` fetches ONE contiguous ``C + pad`` row window per
    chunk and cuts every view (i rows + all 14 offsets) as static in-window
    slices -- the round-3d window-fetch optimization applied to the half
    sweep.

    ``materialize=True`` routes the per-pair products through an
    optimization barrier before the dual reduction, forcing XLA to
    materialize the pair block once instead of (potentially)
    rematerializing the whole per-pair chain for each reduce side -- the
    suspected cause of the round-2 half-shell null (docs/BENCHMARKS.md).
    Measured knob, not an auto default.

    Returns (force [3, n_total, A] | None, [scalars [n_total, A]...]),
    dense contributions on ALL rows (halo rows pending fold).
    """
    A = r.shape[-1]
    dtype = r.dtype
    d_of_b, b_of_d, flat_offsets, pad = dense_maps(geom)
    D = len(b_of_d)
    pos_offsets = sorted(int(d) for d in flat_offsets if d > 0)

    C = min(chunk, D)
    n_chunks = -(-D // C)
    Dp = n_chunks * C
    JW = C + pad                      # j staging width per chunk
    rpad = (Dp - D) + pad             # right padding covers j reads

    rd = jnp.take(r, jnp.asarray(b_of_d), axis=1)          # [3, D, A]
    sent = jnp.full((3, rpad, A), dtype.type(1.0e10), dtype=dtype)
    rp = jnp.concatenate([rd, sent], axis=1)
    iv = np.zeros(Dp, dtype=bool)
    iv[:D] = is_local_dense(geom)
    iv_dev = jnp.asarray(iv)
    sp = []
    for s in scalar_j:
        sd = jnp.take(s, jnp.asarray(b_of_d), axis=0)
        sp.append(jnp.concatenate(
            [sd, jnp.zeros((rpad, A), s.dtype)], axis=0))

    BIG = dtype.type(1.0e30)
    tri = jax.lax.broadcasted_iota(jnp.int32, (A, A), 0) < \
        jax.lax.broadcasted_iota(jnp.int32, (A, A), 1)     # slot_i < slot_j

    # Lane grouping: a lone [C, A, A] pair block uses only A=32 of the 128
    # TPU lanes in its minor axis; concatenating G offsets' j-cells on the
    # lane axis ([C, A, G*A]) keeps the VPU full.  The self-cell (d=0)
    # joins the first group with its triangular mask restricted to its own
    # lane slice.
    G = max(1, 128 // A)
    all_offsets = [0] + pos_offsets           # d=0 first (self-cell)
    groups = [all_offsets[g:g + G] for g in range(0, len(all_offsets), G)]

    def group_allowed(group):
        cols = [tri if d == 0 else jnp.ones((A, A), bool) for d in group]
        return jnp.concatenate(cols, axis=-1)             # [A, G'*A]

    def body(c0):
        if fetch == "window":
            # ONE contiguous fetch covering the i rows and all 14 views
            # (offsets d in [0, pad]); every view is then a static slice.
            w = jax.lax.dynamic_slice_in_dim(rp, c0, JW, axis=1)
            ws = [jax.lax.dynamic_slice_in_dim(s, c0, JW, axis=0)
                  for s in sp]
            ri = jax.lax.slice_in_dim(w, 0, C, axis=1)     # [3, C, A]
            si = [jax.lax.slice_in_dim(v, 0, C, axis=0) for v in ws]
        else:
            ri = jax.lax.dynamic_slice_in_dim(rp, c0, C, axis=1)
            si = [jax.lax.dynamic_slice_in_dim(s, c0, C, axis=0)
                  for s in sp]
        ivc = jax.lax.dynamic_slice_in_dim(iv_dev, c0, C)      # [C]
        si_args = [v[:, :, None] for v in si]

        jbuf_f = jnp.zeros((3, JW, A), dtype) if want_force else None
        i_f = jnp.zeros((3, C, A), dtype) if want_force else None
        i_s = None
        jbuf_s = None

        for group in groups:
            if fetch == "window":
                rj = jnp.concatenate(
                    [jax.lax.slice_in_dim(w, d, d + C, axis=1)
                     for d in group], axis=-1)             # [3, C, G'A]
                sj_args = [jnp.concatenate(
                    [jax.lax.slice_in_dim(v, d, d + C, axis=0)
                     for d in group], axis=-1)[:, None, :] for v in ws]
            else:
                rj = jnp.concatenate(
                    [jax.lax.dynamic_slice_in_dim(rp, c0 + d, C, axis=1)
                     for d in group], axis=-1)             # [3, C, G'A]
                sj_args = [jnp.concatenate(
                    [jax.lax.dynamic_slice_in_dim(s, c0 + d, C, axis=0)
                     for d in group], axis=-1)[:, None, :] for s in sp]
            dr = ri[:, :, :, None] - rj[:, :, None, :]     # [3, C, A, G'A]
            r2 = dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2]
            r2 = jnp.where(ivc[:, None, None], r2, BIG)
            r2 = jnp.where(group_allowed(group)[None], r2, BIG)
            mask = (r2 <= dtype.type(rcut2)) & (r2 > 0)
            fcoef, scalars = pair_fn(r2, mask, sj_args, si_args)

            # one variadic reduce per delivery side: all outputs (force
            # products + scalars) reduce together so the shared per-pair
            # quantities are computed once per side instead of once per
            # output (see cell_pair_sweep)
            prods = []
            if want_force:
                prods.extend(fcoef * dr[a] for a in range(3))
            prods.extend(scalars)
            if materialize:
                prods = list(jax.lax.optimization_barrier(tuple(prods)))
            zero = dtype.type(0)
            add = lambda acc, x: tuple(a + b for a, b in zip(acc, x))  # noqa: E731
            red_i = jax.lax.reduce(tuple(prods), (zero,) * len(prods),
                                   add, (2,))      # sum over j
            red_j = jax.lax.reduce(tuple(prods), (zero,) * len(prods),
                                   add, (1,))      # sum over i
            nf = 3 if want_force else 0
            if want_force:
                i_f = i_f + jnp.stack(red_i[:3])
                fj = jnp.stack([-v for v in red_j[:3]])    # [3, C, G'A]
                for g, d in enumerate(group):
                    jbuf_f = jbuf_f.at[:, d:d + C].add(
                        fj[..., g * A:(g + 1) * A])
            sc_i = list(red_i[nf:])
            sc_j = list(red_j[nf:])
            if i_s is None:
                i_s = sc_i
                jbuf_s = [jnp.zeros((JW, A), dtype) for _ in scalars]
            else:
                i_s = [a + b for a, b in zip(i_s, sc_i)]
            for g, d in enumerate(group):
                jbuf_s = [jb.at[d:d + C].add(sj_[..., g * A:(g + 1) * A])
                          for jb, sj_ in zip(jbuf_s, sc_j)]

        res = []
        if want_force:
            res.extend([i_f, jbuf_f])
        for a, jb in zip(i_s or [], jbuf_s or []):
            res.extend([a, jb])
        return tuple(res)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * C
    results = jax.lax.map(body, starts)

    def overlap_add(i_stk, j_stk, lead):
        """i_stk [n, ...lead, C, A] + j_stk [n, ...lead, JW, A] -> dense."""
        perm = tuple(range(1, 1 + lead)) + (0,) + (1 + lead, 2 + lead)
        i_d = jnp.transpose(i_stk, perm).reshape(
            i_stk.shape[1:1 + lead] + (Dp, A))
        n_seg = -(-JW // C)
        j_pad = jnp.pad(j_stk, [(0, 0)] * (1 + lead)
                        + [(0, n_seg * C - JW), (0, 0)])
        total = jnp.zeros(i_stk.shape[1:1 + lead] + (Dp + n_seg * C, A),
                          i_stk.dtype)
        total = jax.lax.dynamic_update_slice_in_dim(total, i_d, 0, axis=lead)
        for s in range(n_seg):
            seg = j_pad[..., s * C:(s + 1) * C, :]
            seg = jnp.transpose(seg, perm).reshape(
                j_stk.shape[1:1 + lead] + (Dp, A))
            upd = jax.lax.dynamic_slice_in_dim(
                total, s * C, Dp, axis=lead) + seg
            total = jax.lax.dynamic_update_slice_in_dim(
                total, upd, s * C, axis=lead)
        return total[..., :D, :]

    back_all = jnp.asarray(d_of_b)     # every box, local + halo
    out = []
    i = 0
    if want_force:
        fd = overlap_add(results[0], results[1], 1)        # [3, D, A]
        out.append(jnp.take(fd, back_all, axis=1))         # [3, B, A]
        i = 2
    scalars_out = []
    while i < len(results):
        sd = overlap_add(results[i], results[i + 1], 0)    # [D, A]
        scalars_out.append(jnp.take(sd, back_all, axis=0))
        i += 2
    force = out[0] if want_force else None
    return force, scalars_out


def fold_halo_serial(geom: CellGeometry, x):
    """Fold halo-row contributions back into owner cells (serial PBC).

    ``x`` is [..., n_total, A]; returns [..., n_local, A].  The half-shell
    analog of the reference's force exchange: ghost contributions
    accumulate into the mirrored local cell (duplicate sources handled by
    scatter-add)."""
    src = jnp.asarray(geom.halo_src)
    local = x[..., :geom.n_local, :]
    halo = x[..., geom.n_local:, :]
    return local.at[..., src, :].add(halo)


def _padded_chunks(geom: CellGeometry, chunk: int,
                   boxes=None) -> tuple[np.ndarray, int, int]:
    """Box ids (all local cells, or an explicit subset) padded to a multiple
    of ``chunk`` (pad replays box 0; padded outputs are sliced off)."""
    if boxes is None:
        boxes = np.arange(geom.n_local, dtype=np.int32)
    boxes = np.asarray(boxes, dtype=np.int32)
    n = len(boxes)
    chunk = min(chunk, max(8, n))
    n_chunks = -(-n // chunk)
    padded = np.zeros((n_chunks * chunk,), dtype=np.int32)
    padded[:n] = boxes
    return padded.reshape(n_chunks, chunk), n_chunks, n


def cell_pair_sweep(
    geom: CellGeometry,
    r: jnp.ndarray,                    # [3, B, A]
    pair_fn: Callable,                 # (r2, mask, i_idx, j_vals) -> (fcoef|None, scalars)
    rcut2: float,
    *,
    scalar_j: Sequence[jnp.ndarray] = (),   # per-atom fields gathered at j
    chunk: int = 256,
    want_force: bool = True,
    boxes=None,                             # optional subset of local boxes
):
    """Run ``pair_fn`` over all (atom i, 27-cell neighbor j) pairs for the
    given boxes (default: every local cell).

    ``pair_fn(r2, mask, sj_list, si_list)`` receives the squared distances
    [C, A, 27A], the validity mask, each requested per-atom field gathered at
    the j atoms ([C, 1, 27A]) and at the i atoms ([C, A, 1]); it returns
    ``(fcoef, scalars)`` where ``fcoef`` (or None) multiplies dr = r_i - r_j
    and is summed into the force on i, and ``scalars`` is a list of per-pair
    values summed over j into per-atom outputs [n_boxes, A] in ``boxes``
    order.

    Returns (force [3, n_boxes, A] or None, [scalar outputs...]).
    """
    A = r.shape[-1]
    boxes_chunks, n_chunks, n_out = _padded_chunks(geom, chunk, boxes)
    nbr = geom.nbr_map  # [n_local, 27]
    nbr_chunks = np.take(nbr, boxes_chunks, axis=0)  # [n_chunks, C, 27]

    r = jnp.asarray(r)
    dtype = r.dtype

    def body(args):
        boxes_c, nbr_c = args            # [C], [C, 27]
        ri = r[:, boxes_c]               # [3, C, A]
        rj = r[:, nbr_c]                 # [3, C, 27, A]
        rj = rj.reshape(3, rj.shape[1], 27 * A)
        dr = ri[:, :, :, None] - rj[:, :, None, :]   # [3, C, A, 27A]
        r2 = dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2]
        mask = (r2 <= dtype.type(rcut2)) & (r2 > 0)

        sj = [s[nbr_c].reshape(-1, 1, 27 * A) for s in scalar_j]
        si = [s[boxes_c][:, :, None] for s in scalar_j]
        fcoef, scalars = pair_fn(r2, mask, sj, si)

        # ONE variadic reduce over the j axis for every output: separate
        # jnp.sum calls invite XLA to split them into independent fusions,
        # each rematerializing the pair geometry and table chains; a single
        # multi-operand reduce keeps one fused loop that computes the
        # shared per-pair quantities exactly once.  (A split force
        # reduction ri*sum(fc) - sum(fc*rj) was also tried and measured
        # null -- XLA fuses dr fine; docs/BENCHMARKS.md round 2b.)
        operands = []
        if want_force:
            assert fcoef is not None
            operands.extend(fcoef * dr[a] for a in range(3))
        operands.extend(scalars)
        zero = r2.dtype.type(0)
        red = jax.lax.reduce(
            tuple(operands), (zero,) * len(operands),
            lambda acc, x: tuple(a + b for a, b in zip(acc, x)), (2,))

        outs = []
        i = 0
        if want_force:
            outs.append(jnp.stack(red[:3]))      # [3, C, A]
            i = 3
        outs.extend(red[i:])                     # each [C, A]
        return tuple(outs)

    results = jax.lax.map(
        body,
        (jnp.asarray(boxes_chunks), jnp.asarray(nbr_chunks)),
    )
    # lax.map stacks -> [n_chunks, ...]; reshape + slice restores [n_out, ...]
    # in ``boxes`` order.
    out = []
    i = 0
    if want_force:
        fstk = results[0]                        # [n_chunks, 3, C, A]
        f = jnp.moveaxis(fstk, 1, 0).reshape(3, n_chunks * boxes_chunks.shape[1], A)
        out.append(f[:, :n_out])
        i = 1
    for res in results[i:]:
        s = res.reshape(n_chunks * boxes_chunks.shape[1], A)
        out.append(s[:n_out])
    force = out[0] if want_force else None
    scalars = out[1:] if want_force else out
    return force, scalars
