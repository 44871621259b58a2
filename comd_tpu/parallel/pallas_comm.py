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
                       *, interpret: bool | None = None):
    """dfEmbed halo exchange via kernel-initiated RDMA (comm_ki analog).

    Drop-in for exchange.exchange_scalar: same 3-stage growing-cross-
    section schedule (x -> y -> z; haloExchange.c:345-475), each plane
    shipped by a Pallas remote copy instead of lax.ppermute.
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
