"""Kernel-initiated halo exchange: Pallas RDMA (the comm_ki.cuh analog).

The reference's kernel-initiated transport (src-mpi/comm_ki.cuh:187-310)
exists to let the GPU post sends/waits itself instead of bouncing through
the host MPI rank -- on TPU, XLA collectives are already device-initiated,
so `lax.ppermute` subsumes the *motivation*.  This module still provides
the literal capability: a Pallas kernel that pushes the packed halo planes
to the neighbor shard over the ICI with `pltpu.make_async_remote_copy`,
synchronized by send/recv DMA semaphores and a neighbor barrier, bypassing
the XLA collective machinery entirely.  It is the building block for
fusing halo pushes INTO force kernels (boundary-block force kernels can
post their plane as soon as it is computed, the reference's
comm_ki+interior-overlap design point).

Select with ``Config.comm_impl = "ki"`` (dfEmbed exchange only; the atom
exchange keeps ppermute).  The staged x->y->z structure and the growing
cross-sections are identical to exchange.exchange_scalar, so forwarding
semantics match the collective path bit for bit.

Testability note: this environment exposes one physical TPU chip, so CI
exercises the kernel on a 1-ring (remote copy to self over the same ICI
machinery) plus interpret mode on the virtual CPU mesh; the multi-chip
path compiles under the driver's dryrun mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cells import CellGeometry
from .exchange import ExchangePlan, _shift_perms


def _ring_push_kernel(src_ref, out_ref, send_sem, recv_sem, *, axis_name,
                      direction, single_axis, use_barrier):
    """Push ``src_ref`` (VMEM) to the ``direction`` neighbor's ``out_ref``.

    direction +1 = to the plus neighbor, -1 = to the minus neighbor.
    Completion: our send semaphore AND the incoming-data recv semaphore.
    ``single_axis``: interpret mode's DMA discharge only supports scalar
    device ids on 1-named-axis meshes; real meshes use the dict form.
    """
    my = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    dst = jax.lax.rem(my + jnp.int32(direction) + jnp.int32(n), jnp.int32(n))
    src = jax.lax.rem(my - jnp.int32(direction) + jnp.int32(n), jnp.int32(n))

    def did(idx):
        return idx if single_axis else {axis_name: idx}

    if use_barrier:
        # neighbor barrier: the destination buffer must exist on the
        # receiver before the RDMA lands (comm_ki's ready-flag handshake,
        # comm_ki.cuh:86-118).  Interpret mode discharges DMAs
        # synchronously and does not implement barrier semaphores.
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=did(dst),
                               device_id_type=pltpu.DeviceIdType.MESH)
        pltpu.semaphore_signal(barrier, inc=1, device_id=did(src),
                               device_id_type=pltpu.DeviceIdType.MESH)
        pltpu.semaphore_wait(barrier, 2)
    rdma = pltpu.make_async_remote_copy(
        src_ref=src_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=did(dst),
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    rdma.start()
    rdma.wait()   # waits send completion AND our own recv semaphore


def _ring_push(x_plane, axis_name, direction, *, interpret, collective_id,
               single_axis=False):
    """Remote-copy a [n_cells, A] plane one step around the mesh ring."""
    kern = functools.partial(_ring_push_kernel, axis_name=axis_name,
                             direction=direction, single_axis=single_axis,
                             use_barrier=not interpret)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x_plane.shape, x_plane.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id),
        interpret=interpret,
    )(x_plane)


def exchange_scalar_ki(plan: ExchangePlan, geom: CellGeometry, x,
                       rhobar_l=None, *, interpret: bool | None = None):
    """dfEmbed halo exchange via kernel-initiated RDMA (comm_ki analog).

    Drop-in for exchange.exchange_scalar: same 3-stage growing-cross-
    section schedule (x -> y -> z; haloExchange.c:345-475), each plane
    shipped by a Pallas remote copy instead of lax.ppermute.
    (``rhobar_l`` accepted for fill-contract compatibility; unused here --
    see exchange_scalar_ki_fused.)
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # distinct collective id per (stage, direction): the barrier/sem
    # handshake of each push must not be satisfiable by signals from a
    # neighboring push under device skew (the comm_ki ready-flag
    # semantics, comm.cc:326-397)
    for axis in range(3):
        name = plan.axis_names[axis]
        send_m, send_p = (jnp.asarray(v) for v in plan.force_send[axis])
        recv_m, recv_p = (jnp.asarray(v) for v in plan.force_recv[axis])
        got_from_plus = _ring_push(x[send_m], name, -1,
                                   interpret=interpret,
                                   collective_id=7 + 2 * axis)
        got_from_minus = _ring_push(x[send_p], name, +1,
                                    interpret=interpret,
                                    collective_id=8 + 2 * axis)
        x = x.at[recv_p].set(got_from_plus)
        x = x.at[recv_m].set(got_from_minus)
    return x


def _pack_ints(v, dtype):
    """Ship int32 payloads through a float-typed RDMA buffer, exactly.

    f32 buffers: bitcast (same width).  f64 buffers: numeric cast (every
    int32, including EMPTY_GID = 2^31-1, is exact in f64)."""
    if dtype == jnp.float32:
        return jax.lax.bitcast_convert_type(v, jnp.float32)
    return v.astype(dtype)


def _unpack_ints(v, dtype):
    if dtype == jnp.float32:
        return jax.lax.bitcast_convert_type(v, jnp.int32)
    return jnp.round(v).astype(jnp.int32)


def exchange_atoms_ki(plan: ExchangePlan, geom: CellGeometry,
                      r, p, gid, n_atoms, *,
                      interpret: bool | None = None):
    """3-stage staged ATOM exchange via kernel-initiated RDMA.

    The reference's exchangeData_Atoms_KI (comm_ki.cuh:437-496): the packed
    AtomMsg buffer is sent from inside the kernel.  Here each face's cell
    blocks (r, p, gid, counts) are packed into ONE [8, n, A] buffer of the
    dynamics dtype (ints shipped exactly, see _pack_ints) and pushed with a
    single remote copy per direction; arrivals are re-binned by coordinate
    exactly as the collective path (exchange.exchange_atoms), so the two
    transports are bit-identical end to end.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    A = r.shape[-1]
    dtype = r.dtype
    overflow = jnp.zeros((), jnp.bool_)

    for axis in range(3):
        name = plan.axis_names[axis]
        ext = dtype.type(plan.local_extent[axis])
        minus_ids, plus_ids = plan.atom_send[axis]

        def pack(ids):
            ids_j = jnp.asarray(ids)
            gidc = _pack_ints(gid[ids_j], dtype)                  # [n, A]
            cnts = _pack_ints(
                jnp.broadcast_to(n_atoms[ids_j, None],
                                 (len(ids), A)), dtype)           # [n, A]
            return jnp.concatenate(
                [r[:, ids_j], p[:, ids_j], gidc[None], cnts[None]], axis=0)

        got_from_plus = _ring_push(pack(minus_ids), name, -1,
                                   interpret=interpret,
                                   collective_id=16 + 2 * axis)
        got_from_minus = _ring_push(pack(plus_ids), name, +1,
                                    interpret=interpret,
                                    collective_id=17 + 2 * axis)

        for buf, shift in ((got_from_minus, -ext), (got_from_plus, +ext)):
            br, bp = buf[0:3], buf[3:6]
            bg = _unpack_ints(buf[6], dtype)
            bn = _unpack_ints(buf[7], dtype)[:, 0]
            nmsg = bg.shape[0]
            slot = jax.lax.broadcasted_iota(jnp.int32, (nmsg, A), 1)
            valid = (slot < bn[:, None]).reshape(-1)
            arr_r = br.reshape(3, -1).at[axis].add(shift)
            from ..ops import binning
            r, p, gid, n_atoms, ovf = binning.append_arrivals(
                geom, r, p, gid, n_atoms, arr_r, bp.reshape(3, -1),
                bg.reshape(-1), valid)
            overflow |= ovf

    return r, p, gid, n_atoms, overflow


def make_df_eval_for_kernel(pot, dtype):
    """(eval_fn, consts) for the fused pass-2 push kernel: the two-level
    embedding-derivative evaluator with its packed table passed explicitly
    (Pallas kernels cannot capture array constants).

    This is a RESHAPE-FREE restatement of ``tables.interpolate_twolevel``:
    the round-5 TPU toolchain's Mosaic rejects any in-kernel shape cast
    that moves data between sublanes and lanes (``vector<16x32> ->
    vector<512>``, ``vector<512x32> -> vector<512x8x4>`` -- both of which
    the shared evaluator uses and which compiled on the earlier
    toolchain).  Here the plane arrives as an [N, 1] column and every step
    is elementwise math, a lane broadcast, or a 2D matmul: block fetch =
    one-hot @ T2 (as before); the row-select and 4-point-stencil extract
    become exact 0/1 selection matmuls (R expands the row one-hot across
    the block lanes, S folds the masked block to the stencil, E picks
    stencil columns) instead of a 3D reshape + axis reduction.  All 0/1
    contractions run at HIGHEST precision, so each output lane is a sum
    of zeros plus the selected value -- numerically identical to the
    production pass-2 evaluator's gather-free lookup (<= 1 ulp end to
    end, same quadratic combine in the same order)."""
    from ..potentials import tables
    block_rows, width = 8, 4
    T2np, nb = tables.pack_twolevel([pot.f], block_rows=block_rows)
    tab = pot.f
    x0, inv_dx, n = tab.x0, tab.inv_dx, tab.n

    Rnp = np.zeros((block_rows, block_rows * width), dtype=np.float64)
    Snp = np.zeros((block_rows * width, width), dtype=np.float64)
    for j in range(block_rows):
        for w in range(width):
            Rnp[j, j * width + w] = 1.0
            Snp[j * width + w, w] = 1.0
    Enp = np.eye(width, dtype=np.float64)

    def eval_df(rho, T2, R, S, E):
        hp = jax.lax.Precision.HIGHEST
        r_b = jnp.maximum(rho, x0)                      # [N, 1]
        rr = (r_b - x0) * inv_dx
        ii = jnp.floor(rr).astype(jnp.int32)
        over = ii > n
        ii = jnp.minimum(ii, n)
        frac = jnp.where(over, 0.0, rr - jnp.floor(rr)).astype(T2.dtype)
        hi = ii >> 3                                    # block index
        lo = ii & (block_rows - 1)                      # row within block
        oh = (hi == jnp.arange(nb, dtype=jnp.int32)[None, :]).astype(T2.dtype)
        fetched = jax.lax.dot(oh, T2, precision=hp)     # [N, 8*width]
        sel = (lo == jnp.arange(block_rows,
                                dtype=jnp.int32)[None, :]).astype(T2.dtype)
        sel_full = jax.lax.dot(sel, R, precision=hp)    # [N, 8*width]
        vals = jax.lax.dot(fetched * sel_full, S, precision=hp)   # [N, 4]
        tm1 = jax.lax.dot(vals, E[:, 0:1], precision=hp)          # [N, 1]
        t0 = jax.lax.dot(vals, E[:, 1:2], precision=hp)
        t1 = jax.lax.dot(vals, E[:, 2:3], precision=hp)
        t2 = jax.lax.dot(vals, E[:, 3:4], precision=hp)
        g1 = t1 - tm1
        g2 = t2 - t0
        return 0.5 * (g1 + frac * (g2 - g1)) * inv_dx

    return eval_df, (jnp.asarray(T2np, dtype=dtype),
                     jnp.asarray(Rnp, dtype=dtype),
                     jnp.asarray(Snp, dtype=dtype),
                     jnp.asarray(Enp, dtype=dtype))


def _pass2_push_kernel(*refs, n_consts, eval_df, axis_name, direction,
                       single_axis, use_barrier):
    """Fused embedding-derivative + remote push: compute dF(rhobar) for a
    boundary plane IN-KERNEL and post it to the neighbor as soon as it is
    written -- the comm_ki design point (pack/compute + in-kernel send,
    comm_ki.cuh:187-310) expressed TPU-natively."""
    rho_ref = refs[0]
    const_refs = refs[1:1 + n_consts]
    dfe_ref, recv_ref, send_sem, recv_sem = refs[1 + n_consts:]
    dfe_ref[...] = eval_df(rho_ref[...],
                           *(c[...] for c in const_refs))
    my = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    dst = jax.lax.rem(my + jnp.int32(direction) + jnp.int32(n), jnp.int32(n))
    src = jax.lax.rem(my - jnp.int32(direction) + jnp.int32(n), jnp.int32(n))

    def did(idx):
        return idx if single_axis else {axis_name: idx}

    if use_barrier:
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=did(dst),
                               device_id_type=pltpu.DeviceIdType.MESH)
        pltpu.semaphore_signal(barrier, inc=1, device_id=did(src),
                               device_id_type=pltpu.DeviceIdType.MESH)
        pltpu.semaphore_wait(barrier, 2)
    rdma = pltpu.make_async_remote_copy(
        src_ref=dfe_ref, dst_ref=recv_ref, send_sem=send_sem,
        recv_sem=recv_sem, device_id=did(dst),
        device_id_type=pltpu.DeviceIdType.MESH)
    rdma.start()
    rdma.wait()


def _pass2_push(rho_plane, eval_df, axis_name, direction, *, interpret,
                collective_id, single_axis=False, consts=()):
    """Returns (dfe_plane_local, dfe_plane_received).  ``consts`` are the
    evaluator's table arrays, passed through as kernel inputs.

    The [n_plane_cells, A] plane is flattened to an [N, 1] column OUTSIDE
    the kernel: moving data between sublanes and lanes is an unsupported
    Mosaic shape cast inside the kernel, and the column shape lets the
    reshape-free evaluator (make_df_eval_for_kernel) run its one-hot
    selection matmuls directly with zero in-kernel reshapes.  The wire
    format of the remote copy is shape-agnostic anyway."""
    shape = rho_plane.shape
    rho_row = rho_plane.reshape(-1, 1)
    kern = functools.partial(
        _pass2_push_kernel, n_consts=len(consts), eval_df=eval_df,
        axis_name=axis_name, direction=direction, single_axis=single_axis,
        use_barrier=not interpret)
    local, received = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(consts)),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct(rho_row.shape, rho_row.dtype),
                   jax.ShapeDtypeStruct(rho_row.shape, rho_row.dtype)],
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id),
        interpret=interpret,
    )(rho_row, *consts)
    return local.reshape(shape), received.reshape(shape)


def exchange_scalar_ki_fused(plan: ExchangePlan, geom: CellGeometry, x,
                             rhobar_l=None, *, eval_df=None, df_consts=(),
                             interpret: bool | None = None):
    """dfEmbed exchange with the x-stage pushes FUSED into the embedding
    evaluation: the kernel computes dF(rhobar) for each +-x boundary plane
    and posts it with make_async_remote_copy as soon as it is written (the
    reference's exchangeData_Force_KI fusion, comm_ki.cuh:187-310: worker
    blocks pack, the last one triggers the in-kernel send).  The y/z stages
    forward received columns, which by construction depend on the x-stage
    arrivals, so they remain plain kernel-initiated pushes of the assembled
    field.

    ``eval_df`` is the rho -> dF evaluator (make_f_eval's derivative
    output); it must match the pass-2 evaluator for the interior so plane
    and interior values are consistent.  Falls back to the unfused path
    when rhobar/eval_df are unavailable.
    """
    if rhobar_l is None or eval_df is None:
        return exchange_scalar_ki(plan, geom, x, interpret=interpret)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # --- x stage: fused compute+push ---
    axis = 0
    name = plan.axis_names[axis]
    send_m, send_p = (jnp.asarray(v) for v in plan.force_send[axis])
    recv_m, recv_p = (jnp.asarray(v) for v in plan.force_recv[axis])
    _, got_from_plus = _pass2_push(rhobar_l[send_m], eval_df, name, -1,
                                   interpret=interpret, collective_id=22,
                                   consts=df_consts)
    _, got_from_minus = _pass2_push(rhobar_l[send_p], eval_df, name, +1,
                                    interpret=interpret, collective_id=23,
                                    consts=df_consts)
    x = x.at[recv_p].set(got_from_plus.astype(x.dtype))
    x = x.at[recv_m].set(got_from_minus.astype(x.dtype))

    # --- y/z stages: kernel-initiated pushes of the assembled field ---
    for axis in (1, 2):
        name = plan.axis_names[axis]
        send_m, send_p = (jnp.asarray(v) for v in plan.force_send[axis])
        recv_m, recv_p = (jnp.asarray(v) for v in plan.force_recv[axis])
        got_from_plus = _ring_push(x[send_m], name, -1, interpret=interpret,
                                   collective_id=7 + 2 * axis)
        got_from_minus = _ring_push(x[send_p], name, +1, interpret=interpret,
                                    collective_id=8 + 2 * axis)
        x = x.at[recv_p].set(got_from_plus)
        x = x.at[recv_m].set(got_from_minus)
    return x
