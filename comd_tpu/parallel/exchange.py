"""Staged halo / migration exchange over a 3D device mesh.

TPU-native rebuild of the reference's haloExchange machinery
(src-mpi/haloExchange.c): the 6-message staged pattern -- x, then y, then z,
with received corner/edge data forwarded in later stages
(haloExchange.c:8-29) -- expressed as `lax.ppermute` collectives inside
`shard_map`.  All of the reference's transports (blocking MPI, libmp
ready-flag one-sided, GPUDirect stream-async, kernel-initiated) collapse into
this one program: XLA owns buffer registration, readiness and ordering, and
overlaps the collectives with independent compute (the `-a 1` capability).

Design choices vs. the reference:

  * Positions are stored in *shard-local* frames, so the PBC coordinate
    shift on receive is a uniform +/- localExtent per axis -- no
    rank-position special cases (cf. shift factors haloExchange.c:310-323).
  * The atom exchange ships whole fixed-capacity cell blocks: two planes per
    face (outer local plane = ghosts, halo plane = migrants), full extended
    cross-section, like the reference's cell lists (haloExchange.c:1543-1567).
    Receivers re-bin arrivals by coordinate, which places ghosts in halo
    cells and migrants in local cells uniformly.
  * The force (dfEmbed) exchange ships one plane per face with the growing
    cross-section (x: local cross, y: x-extended, z: fully extended;
    haloExchange.c:345-475, 1712-1801) and writes receiver halo cells
    directly: canonical in-cell gid order makes ghost cells slot-aligned
    with their owner cells, eliminating the reference's hash-table / in-cell
    sort machinery (hashTable.c, gpu_redistribute.h:514-554).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..cells import CellGeometry
from ..ops import binning
from ..ops import scan as scan_ops


def _scope(name):
    """jax.named_scope decorator: phase names show up in xprof timelines
    (the NVTX PUSH_RANGE analog, reference haloExchange.c:73-90)."""
    import functools
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*a, **k):
            with jax.named_scope(name):
                return fn(*a, **k)
        return wrapper
    return deco

def _cells_where(geom: CellGeometry, axis: int, values, cross) -> np.ndarray:
    """Box ids whose tuple has t[axis] in ``values`` and the other axes
    within ``cross`` bounds; ordered lexicographically by tuple so sender and
    receiver lists correspond element-wise."""
    t = geom.tuple_of_box
    mask = np.isin(t[:, axis], values)
    for a in range(3):
        if a == axis:
            continue
        lo, hi = cross[a]
        mask &= (t[:, a] >= lo) & (t[:, a] <= hi)
    ids = np.flatnonzero(mask)
    order = np.lexsort((t[ids, 2], t[ids, 1], t[ids, 0]))
    return ids[order].astype(np.int32)


@dataclasses.dataclass(frozen=True)
class ExchangePlan:
    """Static send/recv cell lists for the 3-stage exchange."""
    # atom exchange: [axis][dir] -> box id array (dir 0 = minus, 1 = plus)
    atom_send: tuple
    # force exchange: send and recv lists, growing cross-section
    force_send: tuple
    force_recv: tuple
    axis_names: tuple[str, str, str]
    local_extent: np.ndarray  # [3]
    # count-packed atom messages: per-axis entry capacity (0 = ship the
    # full-capacity cell planes).  The reference computes send sizes
    # on-device and ships only packed real atoms (gpu_kernels.cu:684-690,
    # haloExchange.c:491-496); message sizes must be static under XLA, so
    # the dynamic size becomes a capped packed buffer + count + overflow
    # flag, like cells.
    atom_cap: tuple = (0, 0, 0)


def make_plan(geom: CellGeometry, axis_names=("x", "y", "z"), *,
              msg_factor: float = 0.0, max_atoms: int = 0) -> ExchangePlan:
    g = geom.grid
    full = {a: (-1, g[a]) for a in range(3)}
    local = {a: (0, g[a] - 1) for a in range(3)}

    atom_send = []
    for axis in range(3):
        minus = _cells_where(geom, axis, [-1, 0], full)
        plus = _cells_where(geom, axis, [g[axis] - 1, g[axis]], full)
        atom_send.append((minus, plus))

    # force exchange: growing cross-section (x local, y x-extended, z full)
    crosses = [
        {0: local[0], 1: local[1], 2: local[2]},
        {0: full[0], 1: local[1], 2: local[2]},
        {0: full[0], 1: full[1], 2: local[2]},
    ]
    force_send, force_recv = [], []
    for axis in range(3):
        c = crosses[axis]
        send_minus = _cells_where(geom, axis, [0], c)
        send_plus = _cells_where(geom, axis, [g[axis] - 1], c)
        recv_minus = _cells_where(geom, axis, [-1], c)       # from minus nbr
        recv_plus = _cells_where(geom, axis, [g[axis]], c)   # from plus nbr
        force_send.append((send_minus, send_plus))
        force_recv.append((recv_minus, recv_plus))

    # packed-message capacities: the two send planes per face average ~50%
    # slot occupancy (the outer local plane carries the real atoms, the
    # halo plane only migrants), so factor*nmsg*A bounds the real entries
    # with headroom; overflow aborts like a cell overflow.
    atom_cap = (0, 0, 0)
    if msg_factor > 0:
        if max_atoms <= 0:
            raise ValueError("msg_factor > 0 requires max_atoms")
        atom_cap = tuple(
            max(256, -(-int(msg_factor * len(atom_send[a][0]) * max_atoms)
                       // 128) * 128)
            for a in range(3))

    return ExchangePlan(
        atom_send=tuple(atom_send),
        force_send=tuple(force_send),
        force_recv=tuple(force_recv),
        axis_names=tuple(axis_names),
        local_extent=(geom.local_max - geom.local_min),
        atom_cap=atom_cap,
    )


def atom_msg_bytes(plan: ExchangePlan, A: int, itemsize: int) -> dict:
    """Static per-step atom-exchange traffic accounting: bytes shipped per
    shard over the 6 faces, full-capacity planes vs count-packed buffers
    (the measurement VERDICT r3 item 4 asks to record; the reference's
    analog is the on-GPU size scan, gpu_kernels.cu:684-690)."""
    full = packed = 0
    for axis in range(3):
        nmsg = len(plan.atom_send[axis][0])
        # r+p (6 coords x itemsize) + gid (4) per slot entry; counts ~0
        per_entry = 6 * itemsize + 4
        full += 2 * (nmsg * A * per_entry + nmsg * 4)
        cap = plan.atom_cap[axis] or nmsg * A
        packed += 2 * (cap * per_entry + 4)
    return {"full_bytes": full, "packed_bytes": packed,
            "ratio": full / max(packed, 1)}


def _shift_perms(axis_name: str):
    """ppermute permutations: send-to-minus and send-to-plus along an axis."""
    n = jax.lax.axis_size(axis_name)
    to_minus = [(i, (i - 1) % n) for i in range(n)]
    to_plus = [(i, (i + 1) % n) for i in range(n)]
    return to_minus, to_plus


@_scope("exchange_atoms:atomHalo")
def exchange_atoms(plan: ExchangePlan, geom: CellGeometry,
                   r, p, gid, n_atoms):
    """3-stage staged atom exchange (ghosts + migration + forwarding).

    Must be called inside shard_map over the plan's mesh axes, with cells
    freshly rebucketed (keep_halo=True).  Returns updated
    (r, p, gid, n_atoms, overflow); caller applies sort_cells afterwards to
    restore canonical in-cell order.
    """
    A = r.shape[-1]
    dtype = r.dtype
    overflow = jnp.zeros((), jnp.bool_)

    for axis in range(3):
        name = plan.axis_names[axis]
        to_minus, to_plus = _shift_perms(name)
        ext = dtype.type(plan.local_extent[axis])
        cap = plan.atom_cap[axis]

        minus_ids, plus_ids = plan.atom_send[axis]
        bufs = []
        for ids in (minus_ids, plus_ids):
            ids_j = jnp.asarray(ids)
            if cap:
                # count-packed message: compact the real atoms of the two
                # send planes into a [cap] buffer + count (the on-device
                # size scan + packed AtomMsg of the reference,
                # gpu_kernels.cu:684-690; overflow aborts like a cell
                # overflow).  append_arrivals re-sorts by (box, gid), so
                # packing order cannot change the trajectory.
                nmsg = len(ids)
                slot = jax.lax.broadcasted_iota(jnp.int32, (nmsg, A), 1)
                valid = (slot < n_atoms[ids_j][:, None]).reshape(-1)
                # compact_indices, not jnp.nonzero: avoids nonzero's int64
                # full-length cumsum which overflows TPU scoped VMEM at
                # large plane sizes (see ops/scan.py docstring).
                sel, count = scan_ops.compact_indices(valid, cap)
                overflow |= count > cap
                rp6 = jnp.concatenate(
                    [r[:, ids_j].reshape(3, -1),
                     p[:, ids_j].reshape(3, -1)], axis=0)[:, sel]
                bufs.append((rp6, gid[ids_j].reshape(-1)[sel], count))
            else:
                bufs.append((r[:, ids_j], p[:, ids_j], gid[ids_j],
                             n_atoms[ids_j]))
        # pack both directions before any unload (reference per-axis order)
        recv_from_plus = jax.tree.map(
            lambda x: jax.lax.ppermute(x, name, to_minus), bufs[0])
        recv_from_minus = jax.tree.map(
            lambda x: jax.lax.ppermute(x, name, to_plus), bufs[1])

        for buf, shift in ((recv_from_minus, -ext), (recv_from_plus, +ext)):
            if cap:
                b6, bg, bc = buf
                valid = jax.lax.broadcasted_iota(
                    jnp.int32, (cap, 1), 0).reshape(cap) < bc
                arr_r = b6[:3].at[axis].add(shift)
                arr_p = b6[3:]
                arr_g = bg
            else:
                br, bp, bg, bn = buf
                nmsg = bg.shape[0]
                slot = jax.lax.broadcasted_iota(jnp.int32, (nmsg, A), 1)
                valid = (slot < bn[:, None]).reshape(-1)
                arr_r = br.reshape(3, -1)
                arr_r = arr_r.at[axis].add(shift)
                arr_p = bp.reshape(3, -1)
                arr_g = bg.reshape(-1)
            r, p, gid, n_atoms, ovf = binning.append_arrivals(
                geom, r, p, gid, n_atoms, arr_r, arr_p, arr_g, valid)
            overflow |= ovf

    return r, p, gid, n_atoms, overflow


@_scope("exchange_positions:ghostRefresh")
def exchange_positions(plan: ExchangePlan, geom: CellGeometry, r):
    """Slot-aligned ghost-position refresh between NL rebuilds.

    Between neighbor-list rebuilds the cell layout is frozen, so ghost cells
    stay slot-aligned with their owner cells and a plane-block copy (with the
    per-axis PBC shift) refreshes every ghost coordinate -- the reference's
    hash-table slot-reuse path (hashTable.c, gpu_redistribute.h:514-554)
    reduced to three ppermutes.
    """
    dtype = r.dtype
    for axis in range(3):
        name = plan.axis_names[axis]
        to_minus, to_plus = _shift_perms(name)
        ext = dtype.type(plan.local_extent[axis])
        (send_m, send_p) = plan.force_send[axis]
        (recv_m, recv_p) = plan.force_recv[axis]
        got_from_plus = jax.lax.ppermute(
            r[:, jnp.asarray(send_m)], name, to_minus)
        got_from_minus = jax.lax.ppermute(
            r[:, jnp.asarray(send_p)], name, to_plus)
        got_from_plus = got_from_plus.at[axis].add(ext)
        got_from_minus = got_from_minus.at[axis].add(-ext)
        r = r.at[:, jnp.asarray(recv_p)].set(got_from_plus)
        r = r.at[:, jnp.asarray(recv_m)].set(got_from_minus)
    return r


@_scope("fold_halo:forceHaloFold")
def fold_halo(plan: ExchangePlan, geom: CellGeometry, x):
    """Half-shell force exchange: fold ghost-cell accumulations back into
    their owner cells across the mesh, then return the local rows.

    This is ``exchange_scalar`` REVERSED: stage order z -> y -> x with the
    same growing cross-sections, halo planes sent back and ADDED into the
    sender-side local planes, so edge/corner contributions forward across
    two or three hops exactly as fills do (haloExchange.c:345-475 run
    backwards).  Axes of size 1 fold a shard's own periodic images
    (ppermute is the identity there), subsuming the serial PBC fold.

    ``x`` is [..., n_total, A]; returns [..., n_local, A].
    """
    for axis in (2, 1, 0):
        name = plan.axis_names[axis]
        to_minus, to_plus = _shift_perms(name)
        send_m, send_p = (jnp.asarray(v) for v in plan.force_send[axis])
        recv_m, recv_p = (jnp.asarray(v) for v in plan.force_recv[axis])
        # my -1 halo plane belongs to the minus neighbor's top local plane
        got_from_plus = jax.lax.ppermute(
            jnp.take(x, recv_m, axis=-2), name, to_minus)
        got_from_minus = jax.lax.ppermute(
            jnp.take(x, recv_p, axis=-2), name, to_plus)
        x = x.at[..., send_p, :].add(got_from_plus)
        x = x.at[..., send_m, :].add(got_from_minus)
    return x[..., :geom.n_local, :]


@_scope("exchange_scalar:eamHalo")
def exchange_scalar(plan: ExchangePlan, geom: CellGeometry, x,
                    rhobar_l=None):
    """Staged halo exchange of a per-atom scalar field (EAM dfEmbed).
    (``rhobar_l`` accepted for fill-contract compatibility; only the fused
    kernel-initiated transport uses it.)

    Slot-aligned cell-block copies; growing cross-section forwards edge and
    corner values (eam.c:59-72, haloExchange.c:345-475).
    """
    for axis in range(3):
        name = plan.axis_names[axis]
        to_minus, to_plus = _shift_perms(name)
        (send_m, send_p) = plan.force_send[axis]
        (recv_m, recv_p) = plan.force_recv[axis]
        got_from_plus = jax.lax.ppermute(x[jnp.asarray(send_m)], name, to_minus)
        got_from_minus = jax.lax.ppermute(x[jnp.asarray(send_p)], name, to_plus)
        x = x.at[jnp.asarray(recv_p)].set(got_from_plus)
        x = x.at[jnp.asarray(recv_m)].set(got_from_minus)
    return x
