"""On-device atom redistribution ("rebucketing") and halo-cell filling.

The reference redistributes atoms after every drift with mutable per-cell
moves + stream compaction + an in-cell gid merge sort
(UpdateLinkCells/CompactAtoms, src-mpi/gpu_redistribute.h:135-268;
sortAtomsGpu, src-mpi/gpu_kernels.cu:1013-1043) and keeps halo slots stable
across steps with a FIFO offset table (src-mpi/hashTable.c:35-94).

On TPU all of that collapses into ONE fixed-shape canonicalization: compute
each atom's destination cell from its coordinates (ownership tie-breaking
rules of getBoxFromCoord, src-mpi/linkCells.c:448-480), sort the flat atom
array by (cell, gid) with a single `lax.sort`, and scatter into the dense
[nBoxes, MAXATOMS] layout.  The (cell, gid) order is canonical, which makes
energies bitwise run-to-run reproducible -- the property the reference could
only *test* for (CoMD.c:947-958) we get by construction.

Halo cells are then filled by a static gather (serial/periodic case) or by
the staged mesh exchange in parallel/exchange.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cells import CellGeometry
from .scan import run_rank

#: coordinate sentinel for empty slots; far from any real atom, and pairs of
#: empty slots coincide so r2==0 masks them out (reference instead stores one
#: atom "at infinity", src-mpi/initAtoms.c:30,55-57).
EMPTY_POS = 1.0e10
EMPTY_GID = np.int32(2**31 - 1)


def box_from_tuple_jnp(geom: CellGeometry, ix, iy, iz):
    """jnp port of getBoxFromTuple (linkCells.c:299-346); see cells.py."""
    gx, gy, gz = geom.grid
    n_local = geom.n_local
    zp = n_local + 2 * gz * gy + 2 * gz * (gx + 2) + \
        (gx + 2) * (gy + 2) + (gx + 2) * (iy + 1) + (ix + 1)
    zm = n_local + 2 * gz * gy + 2 * gz * (gx + 2) + \
        (gx + 2) * (iy + 1) + (ix + 1)
    yp = n_local + 2 * gz * gy + gz * (gx + 2) + (gx + 2) * iz + (ix + 1)
    ym = n_local + 2 * gz * gy + iz * (gx + 2) + (ix + 1)
    xp = n_local + gy * gz + iz * gy + iy
    xm = n_local + iz * gy + iy
    if geom.use_hilbert:
        lut = jnp.asarray(geom.local_box_of_tuple)
        local = lut[jnp.clip(ix, 0, gx - 1), jnp.clip(iy, 0, gy - 1),
                    jnp.clip(iz, 0, gz - 1)]
    else:
        local = ix + iy * gx + iz * gx * gy
    out = local
    out = jnp.where(ix == -1, xm, out)
    out = jnp.where(ix == gx, xp, out)
    out = jnp.where(iy == -1, ym, out)
    out = jnp.where(iy == gy, yp, out)
    out = jnp.where(iz == -1, zm, out)
    out = jnp.where(iz == gz, zp, out)
    return out.astype(jnp.int32)


def box_from_coord_jnp(geom: CellGeometry, rx, ry, rz):
    """jnp port of getBoxFromCoord ownership rules (linkCells.c:448-480)."""
    tup = []
    for a, ra in enumerate((rx, ry, rz)):
        g = geom.grid[a]
        ia = jnp.floor(
            (ra - geom.local_min[a]) * geom.inv_box_size[a]).astype(jnp.int32)
        inside = ra < geom.local_max[a]
        ia = jnp.where(inside & (ia == g), g - 1, ia)
        ia = jnp.where(inside, ia, g)
        tup.append(jnp.clip(ia, -1, g))
    return box_from_tuple_jnp(geom, *tup)


def wrap_pbc(r, global_extent):
    """Wrap coordinates into [0, L] per axis.

    The result may land exactly on L for values infinitesimally below 0 (fp
    rounding); rebucket() folds such boundary cases back through the halo map
    (the serial self-exchange, src-mpi/CoMD.c:1127-1129), so no strict [0, L)
    guarantee is needed here.
    """
    L = jnp.asarray(global_extent, dtype=r.dtype).reshape(3, *([1] * (r.ndim - 1)))
    r = r - L * jnp.floor(r / L)
    return jnp.where(r >= L, r - L, r)


def rebucket(geom: CellGeometry, r, p, gid, n_atoms, *, wrap_extent=None,
             keep_halo: bool = False):
    """Re-bin all local atoms into canonical (cell, gid) dense layout.

    Args:
      r, p: [3, B, A] with B >= n_local (only local boxes are read).
      gid:  [B, A] int32.
      n_atoms: [B] int32 occupancy.
      wrap_extent: if given (serial/periodic case), coordinates are wrapped
        into [0, L) so every atom lands in a local cell.  In the sharded case
        the caller leaves this None and handles halo-cell landers via the
        migration exchange.
      keep_halo: sharded case -- atoms that bin into halo cells (they drifted
        off this shard) are *kept* in those halo cells so the staged exchange
        can ship them to their new owner (the reference equivalent: drifted
        atoms moved into halo link cells by updateLinkCells, then sent;
        timestep.c:222-276).

    Returns (r, p, gid, n_atoms, n_migrating, overflow) with stale halo boxes
    emptied (emptyHaloCells, linkCells.c:483-487) and every box's atoms
    sorted by gid and compacted to the front.
    """
    A = r.shape[-1]
    B = r.shape[1]
    n_local = geom.n_local
    flat_n = n_local * A

    rl = r[:, :n_local].reshape(3, flat_n)
    pl = p[:, :n_local].reshape(3, flat_n)
    gl = gid[:n_local].reshape(flat_n)
    slot = jax.lax.broadcasted_iota(jnp.int32, (n_local, A), 1).reshape(flat_n)
    valid = slot < jnp.repeat(n_atoms[:n_local], A)

    if wrap_extent is not None:
        rl = wrap_pbc(rl, wrap_extent)

    box = box_from_coord_jnp(geom, rl[0], rl[1], rl[2])

    if wrap_extent is not None:
        # Serial/periodic: an atom binned into a halo cell (possible despite
        # the wrap when fp rounding puts a coordinate exactly on L) is owned
        # by the periodic-image local cell -- fold it back through the halo
        # map, exactly the reference's serial self-exchange with PBC shift
        # (sendReceiveParallel self-copy, src-mpi/parallel.c:112-117).
        in_halo = box >= n_local
        h = jnp.clip(box - n_local, 0, geom.n_halo - 1)
        src = jnp.asarray(geom.halo_src)[h]
        shf = jnp.asarray(geom.halo_shift, dtype=rl.dtype)[h]  # [N, 3]
        box = jnp.where(in_halo, src, box)
        rl = jnp.where(in_halo[None, :], rl - shf.T, rl)

    box = jnp.where(valid, box, jnp.int32(geom.n_total))  # empties sort last
    # migration: atoms binned into halo cells belong to a neighbor shard
    migrating = valid & (box >= n_local)
    n_migrating = jnp.sum(migrating.astype(jnp.int32))

    # canonical (cell, gid) order in one multi-key sort
    idx = jax.lax.broadcasted_iota(jnp.int32, (flat_n, 1), 0).reshape(flat_n)
    box_s, _gid_s, perm = jax.lax.sort((box, gl, idx), num_keys=2)

    # rank within destination cell: arange minus run start (O(N), no
    # search; chunked cummax — see ops/scan.py for the scoped-VMEM bound)
    rank = run_rank(box_s)

    max_box = geom.n_total if keep_halo else n_local
    in_cell = box_s < jnp.int32(max_box)
    overflow = jnp.any(in_cell & (rank >= A))
    dest = jnp.where(in_cell & (rank < A), box_s * A + rank,
                     jnp.int32(B * A))  # out-of-range -> dropped

    def scatter(flat_vals, fill):
        out = jnp.full((B * A,), fill, dtype=flat_vals.dtype)
        return out.at[dest].set(flat_vals[perm], mode="drop").reshape(B, A)

    new_r = jnp.stack([scatter(rl[a], rl.dtype.type(EMPTY_POS))
                       for a in range(3)])
    new_p = jnp.stack([scatter(pl[a], pl.dtype.type(0)) for a in range(3)])
    new_gid = scatter(gl, EMPTY_GID)
    counts = jnp.zeros((B,), jnp.int32).at[box_s].add(
        in_cell.astype(jnp.int32), mode="drop")

    return new_r, new_p, new_gid, counts, n_migrating, overflow


def append_arrivals(geom: CellGeometry, r, p, gid, n_atoms,
                    arr_r, arr_p, arr_gid, arr_valid):
    """Merge exchange arrivals into cells by coordinate binning.

    ``arr_*`` are flat arrival buffers ([3, M] / [M]).  Each valid arrival is
    binned with the ownership rules (getBoxFromCoord) into a local cell
    (migrated atom) or a halo cell (ghost) and appended after the cell's
    current contents; canonical in-cell gid order is restored afterwards by
    sort_cells().  Reference analog: unloadAtomsBuffer -> computeBoxIds +
    UnloadAtomsBufferPacked (src-mpi/gpu_redistribute.h:497-620).

    Returns (r, p, gid, n_atoms, overflow).
    """
    A = r.shape[-1]
    B = r.shape[1]
    M = arr_gid.shape[0]

    box = box_from_coord_jnp(geom, arr_r[0], arr_r[1], arr_r[2])
    box = jnp.where(arr_valid, box, jnp.int32(geom.n_total))

    idx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0).reshape(M)
    box_s, _g, perm = jax.lax.sort((box, arr_gid, idx), num_keys=2)
    rank = run_rank(box_s)

    in_cell = box_s < jnp.int32(geom.n_total)
    base = n_atoms[jnp.clip(box_s, 0, B - 1)]
    slot = base + rank
    overflow = jnp.any(in_cell & (slot >= A))
    dest = jnp.where(in_cell & (slot < A), box_s * A + slot, jnp.int32(B * A))

    r = jnp.stack([
        r[a].reshape(B * A).at[dest].set(arr_r[a][perm], mode="drop")
        for a in range(3)]).reshape(3, B, A)
    p = jnp.stack([
        p[a].reshape(B * A).at[dest].set(arr_p[a][perm], mode="drop")
        for a in range(3)]).reshape(3, B, A)
    gid = gid.reshape(B * A).at[dest].set(arr_gid[perm],
                                          mode="drop").reshape(B, A)
    n_atoms = n_atoms.at[box_s].add(in_cell.astype(jnp.int32), mode="drop")
    return r, p, gid, n_atoms, overflow


def sort_cells(r, p, gid):
    """Canonical in-cell gid sort (all cells), [B, A] row-wise.

    Replaces the reference's boundary-cell merge sort + shuffle
    (SortAtomsByGlobalId / ShuffleAtomsData, gpu_redistribute.h:735-848) and
    the hash-table slot-stability machinery (hashTable.c): with gid-canonical
    cells, a ghost cell's slot order always equals its owner cell's, so the
    EAM dfEmbed exchange is a plain slot-aligned block copy.
    """
    order = jnp.argsort(gid, axis=-1)
    gid = jnp.take_along_axis(gid, order, axis=-1)
    r = jnp.stack([jnp.take_along_axis(r[a], order, axis=-1)
                   for a in range(3)])
    p = jnp.stack([jnp.take_along_axis(p[a], order, axis=-1)
                   for a in range(3)])
    return r, p, gid


def fill_halo_serial(geom: CellGeometry, r, gid, n_atoms, dtype=None):
    """Periodic-image halo fill for the single-domain case.

    Serial CoMD degenerates its halo exchange into self-copies with PBC
    shifts (doc: src-mpi/CoMD.c:1127-1129); here that is one static gather.
    """
    n_local = geom.n_local
    src = jnp.asarray(geom.halo_src)
    shift = jnp.asarray(geom.halo_shift, dtype=r.dtype)  # [H, 3]
    r_h = r[:, src] + shift.T[:, :, None]
    r = r.at[:, n_local:].set(r_h)
    gid = gid.at[n_local:].set(gid[src])
    n_atoms = n_atoms.at[n_local:].set(n_atoms[src])
    return r, gid, n_atoms


def fill_halo_scalar_serial(geom: CellGeometry, x):
    """Halo fill for a per-atom scalar field (EAM dfEmbed, eam.c:368-371)."""
    src = jnp.asarray(geom.halo_src)
    return x.at[geom.n_local:].set(x[src])
