"""Verlet neighbor lists with skin-displacement rebuild triggering.

Reference: CPU half-lists (src-mpi/neighborList.c:50-247), GPU full lists of
MAXNEIGHBORLISTSIZE=64 entries (gpu_neighborList.c, defines.h:66), built by
ballot/popc compaction kernels (gpu_kernels.cu:1494-2029); rebuild when any
atom moved more than skin/2 since the last build, agreed globally
(neighborList.c:212-247, gpu_kernels.cu:1448-1484).

TPU design: rows are *compacted local atoms* (a_list), entries are flat slot
ids into the dense [B, A] layout (self-id padding, so padded entries yield
r2 == 0 and mask out -- replacing the reference's sentinel atom at infinity,
initAtoms.c:30).  Between rebuilds the cell layout is frozen (no rebucket),
exactly like the reference's NL path (redistributeAtomsGpuNL,
timestep.c:376-400): ghosts are refreshed by slot-aligned position copies,
and the expensive canonicalization runs only when the skin triggers.
Compaction uses top_k over the candidate mask (first-K-valid, deterministic).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..cells import CellGeometry
from .scan import compact_indices


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NeighborList:
    a_list: jax.Array    # [nRows] flat slot ids of local atoms (compact)
    a_valid: jax.Array   # [nRows] bool
    nl: jax.Array        # [nRows, K] flat slot ids (self-id padded)
    last_r: jax.Array    # [3, B, A] position snapshot at build time


def n_rows_for(geom: CellGeometry, max_atoms: int, factor: float = 1.0) -> int:
    """Static row capacity.  Default: every local slot (safe upper bound);
    pass factor<1 to size by expected occupancy."""
    n = int(geom.n_local * max_atoms * factor)
    return max(128, -(-n // 128) * 128)  # pad to lane multiple


def build_atom_list(geom: CellGeometry, n_atoms, A: int, n_rows: int):
    """Compact flat slot ids of all local atoms (BuildAtomLists analog,
    gpu_kernels.cu:409-454)."""
    slot = jax.lax.broadcasted_iota(jnp.int32, (geom.n_local, A), 1)
    valid = slot < n_atoms[:geom.n_local, None]
    flat_valid = valid.reshape(-1)
    # compact_indices, not jnp.nonzero: nonzero's int64 full-length cumsum
    # overflows TPU scoped VMEM at this scale (see ops/scan.py docstring).
    idx, n_real = compact_indices(flat_valid, n_rows)
    ar = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0).reshape(n_rows)
    return idx, ar < n_real, n_real


def row_split_for(geom: CellGeometry, A: int):
    """Static row partition for the -a 1 NL overlap: (is_boundary [n_local],
    Ri, Rb) with interior rows first.  Rb = boundary-cell slots exactly (a
    boundary cell holds at most A atoms, so the boundary segment can never
    overflow); Ri covers every interior slot.  Both are padded to lane
    multiples.  The reference's i_list/b_list split (gpu_utility.c:73-163)
    for the NL methods (timestep.c:257-265, :328-351)."""
    from .. import cells
    interior, boundary = cells.boundary_lists(geom, ring=1)
    is_boundary = np.zeros(geom.n_local, dtype=bool)
    is_boundary[boundary] = True
    pad = lambda n: max(128, -(-n // 128) * 128)  # noqa: E731
    return is_boundary, pad(len(interior) * A), pad(len(boundary) * A)


def build_atom_list_split(geom: CellGeometry, n_atoms, A: int, row_split):
    """Compact slot ids partitioned into [interior rows (Ri)] ++
    [boundary rows (Rb)]: interior-cell atoms' NL entries reference only
    local cells, so their sweeps can read pre-exchange state (the -a 1
    overlap, see sharded._force_fn_nl)."""
    is_boundary, Ri, Rb = row_split
    is_b = jnp.asarray(is_boundary)
    slot = jax.lax.broadcasted_iota(jnp.int32, (geom.n_local, A), 1)
    valid = slot < n_atoms[:geom.n_local, None]
    v_i = (valid & ~is_b[:, None]).reshape(-1)
    v_b = (valid & is_b[:, None]).reshape(-1)
    # compact_indices, not jnp.nonzero: nonzero's int64 full-length cumsum
    # is what killed the sharded-NL TPU compile at 32^3/A=32 (19.09M scoped
    # VMEM, tools/r5_logs/overlap32_nl.log.2; see ops/scan.py docstring).
    idx_i, n_i = compact_indices(v_i, Ri)
    idx_b, n_b = compact_indices(v_b, Rb)
    a_list = jnp.concatenate([idx_i, idx_b])
    ar_i = jax.lax.broadcasted_iota(jnp.int32, (Ri, 1), 0).reshape(Ri)
    ar_b = jax.lax.broadcasted_iota(jnp.int32, (Rb, 1), 0).reshape(Rb)
    a_valid = jnp.concatenate([ar_i < n_i, ar_b < n_b])
    return a_list, a_valid, n_i + n_b


def slice_rows(nlist: NeighborList, start: int, stop: int) -> NeighborList:
    """Static row-range view of a NeighborList (shares last_r)."""
    return NeighborList(a_list=nlist.a_list[start:stop],
                        a_valid=nlist.a_valid[start:stop],
                        nl=nlist.nl[start:stop], last_r=nlist.last_r)


# Precautionary scoped-VMEM budget for the build's per-chunk top_k pair
# sort across the 27A candidate lane (8 bytes per (value, index) pair,
# 16 MB scoped VMEM on v5e).  NOTE: this clamp was first added against the
# 32^3/A=32 sharded-NL compile failure but MISSED the real culprit — that
# 19.09M reduce-window was jnp.nonzero's int64 full-length cumsum in
# build_atom_list_split, fixed for real by ops/scan.compact_indices
# (tools/r5_logs/overlap32_nl.log.2).  The clamp stays as a cheap bound on
# a same-shaped risk (the build amortizes over ~65 steps, so chunk choice
# is not perf-critical; A<=16 configs are unaffected).
_BUILD_TOPK_VMEM_BUDGET = 8 * 2 ** 20


def build(geom: CellGeometry, r, n_atoms, *, k: int, rcut2: float,
          n_rows: int, chunk: int = 2048, row_split=None) -> tuple:
    """Build the neighbor list.  Returns (NeighborList, overflow).

    ``row_split`` (from row_split_for) orders rows as interior-cell atoms
    first, boundary-cell atoms from index Ri -- the -a 1 layout."""
    B, A = r.shape[1], r.shape[2]
    # Clamp the chunk so the top_k pair sort fits scoped VMEM (see
    # _BUILD_TOPK_VMEM_BUDGET above for provenance and scope).
    max_chunk = max(128, _BUILD_TOPK_VMEM_BUDGET // (27 * A * 8) // 128 * 128)
    chunk = min(chunk, max_chunk)
    r_flat = r.reshape(3, B * A)
    if row_split is not None:
        a_list, a_valid, n_real = build_atom_list_split(
            geom, n_atoms, A, row_split)
        n_rows = row_split[1] + row_split[2]
    else:
        a_list, a_valid, n_real = build_atom_list(geom, n_atoms, A, n_rows)

    nbr_map = jnp.asarray(geom.nbr_map)  # [n_local, 27]
    dtype = r.dtype

    n_chunks = n_rows // chunk if n_rows % chunk == 0 else -(-n_rows // chunk)
    pad_rows = n_chunks * chunk
    rows = jnp.pad(a_list, (0, pad_rows - n_rows)).reshape(n_chunks, chunk)

    def body(rows_c):
        ri = r_flat[:, rows_c]                       # [3, C]
        box = rows_c // A                            # [C] local box id
        cand_boxes = nbr_map[jnp.clip(box, 0, geom.n_local - 1)]  # [C, 27]
        cand = (cand_boxes[:, :, None] * A +
                jax.lax.broadcasted_iota(jnp.int32, (1, 1, A), 2)
                ).reshape(-1, 27 * A)                # [C, 27A] flat slot ids
        rj = r_flat[:, cand]                         # [3, C, 27A]
        dr = ri[:, :, None] - rj
        r2 = dr[0] ** 2 + dr[1] ** 2 + dr[2] ** 2
        mask = (r2 <= dtype.type(rcut2)) & (r2 > 0)
        count = jnp.sum(mask, axis=-1, dtype=jnp.int32)  # no x64 promotion
        vals, kidx = jax.lax.top_k(mask.astype(jnp.int32), k)   # first K valid
        sel = jnp.take_along_axis(cand, kidx, axis=1)           # [C, K]
        sel = jnp.where(vals > 0, sel, rows_c[:, None])         # self-pad
        return sel, count

    sel, count = jax.lax.map(body, rows)
    nl = sel.reshape(pad_rows, k)[:n_rows]
    count = count.reshape(pad_rows)[:n_rows]
    overflow = jnp.any((count > k) & a_valid)

    return NeighborList(a_list=a_list, a_valid=a_valid, nl=nl,
                        last_r=r), overflow


def needs_rebuild(last_r, r, n_local: int, skin: float):
    """Any local atom displaced more than skin/2 since the last build
    (neighborList.c:212-247).  Caller psums across shards for the global
    consensus (maxIntParallel analog).  ``last_r`` may be a NeighborList or
    a raw [3, B, A] snapshot."""
    if isinstance(last_r, NeighborList):
        last_r = last_r.last_r
    d = r[:, :n_local] - last_r[:, :n_local]
    disp2 = d[0] ** 2 + d[1] ** 2 + d[2] ** 2
    return jnp.max(disp2) > (0.5 * skin) ** 2


def pair_sweep_nl(nlist: NeighborList, r, pair_fn, rcut2, *,
                  scalar_j=(), chunk: int = 2048, want_force: bool = True):
    """Neighbor-list pair sweep mirroring sweep.cell_pair_sweep's contract.

    pair_fn(r2, mask, sj, si) -> (fcoef|None, scalars); returns per-ROW
    outputs (force [3, nRows], scalars [nRows]); caller scatters to slots
    via nlist.a_list.
    """
    B, A = r.shape[1], r.shape[2]
    r_flat = r.reshape(3, B * A)
    dtype = r.dtype
    n_rows = nlist.a_list.shape[0]
    k = nlist.nl.shape[1]

    n_chunks = -(-n_rows // chunk)
    pad = n_chunks * chunk - n_rows
    rows = jnp.pad(nlist.a_list, (0, pad)).reshape(n_chunks, chunk)
    nls = jnp.pad(nlist.nl, ((0, pad), (0, 0))).reshape(n_chunks, chunk, k)

    sj_flat = [s.reshape(-1) for s in scalar_j]

    def body(args):
        rows_c, nl_c = args
        ri = r_flat[:, rows_c]                       # [3, C]
        rj = r_flat[:, nl_c]                         # [3, C, K]
        dr = ri[:, :, None] - rj
        r2 = dr[0] ** 2 + dr[1] ** 2 + dr[2] ** 2
        mask = (r2 <= dtype.type(rcut2)) & (r2 > 0)
        sj = [s[nl_c] for s in sj_flat]              # [C, K]
        si = [s[rows_c][:, None] for s in sj_flat]   # [C, 1]
        fcoef, scalars = pair_fn(r2, mask, sj, si)
        # one variadic reduce over K for every output (a single fused loop
        # computing shared per-pair work once; see sweep.cell_pair_sweep)
        operands = []
        if want_force:
            operands.extend(fcoef * dr[a] for a in range(3))
        operands.extend(scalars)
        zero = r2.dtype.type(0)
        red = jax.lax.reduce(
            tuple(operands), (zero,) * len(operands),
            lambda acc, x: tuple(a + b for a, b in zip(acc, x)), (1,))
        outs = []
        i = 0
        if want_force:
            outs.append(jnp.stack(red[:3]))
            i = 3
        outs.extend(red[i:])
        return tuple(outs)

    results = jax.lax.map(body, (rows, nls))
    out = []
    i = 0
    if want_force:
        f = jnp.moveaxis(results[0], 1, 0).reshape(3, n_chunks * chunk)
        out.append(f[:, :n_rows])
        i = 1
    for res in results[i:]:
        out.append(res.reshape(-1)[:n_rows])
    force = out[0] if want_force else None
    return force, (out[1:] if want_force else out)


def scatter_rows(nlist: NeighborList, vals, B: int, A: int, fill=0.0):
    """Scatter per-row values back to the dense [B, A] layout."""
    dest = jnp.where(nlist.a_valid, nlist.a_list, jnp.int32(B * A))
    if vals.ndim == 1:
        out = jnp.full((B * A,), fill, dtype=vals.dtype)
        return out.at[dest].set(vals, mode="drop").reshape(B, A)
    out = jnp.full((vals.shape[0], B * A), fill, dtype=vals.dtype)
    return out.at[:, dest].set(vals, mode="drop").reshape(vals.shape[0], B, A)
