"""Kernel-initiated RDMA halo transport (comm_ki analog).

Interpret mode discharges remote DMAs only on single-named-axis meshes
(NotImplementedError otherwise, both MESH and LOGICAL device ids), so CI
validates the ring-push / fused-push PRIMITIVES on a 1D mesh here; the full
3-axis exchanges (comm_impl='ki'/'ki_fused', atoms + dfEmbed) run with
use_barrier=True on real TPU via tools/tpu_ki_test.py (self-ring on the one
available chip; results recorded in docs/BENCHMARKS.md)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from comd_tpu.parallel.pallas_comm import (_pack_ints, _pass2_push,
                                           _ring_push, _unpack_ints)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@pytest.mark.parametrize("direction", [+1, -1])
def test_ring_push_moves_one_step(direction):
    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("x",))
    x = jnp.arange(n * 16 * 32, dtype=jnp.float32).reshape(n * 16, 32)

    def body(xs):
        return _ring_push(xs, "x", direction, interpret=True,
                          collective_id=7, single_axis=True)

    out = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P("x"),),
                                out_specs=P("x"), check_vma=False))(x)
    out = np.asarray(out).reshape(n, 16, 32)
    xs = np.asarray(x).reshape(n, 16, 32)
    # shard i pushed its block to i+direction
    for i in range(n):
        np.testing.assert_array_equal(out[(i + direction) % n], xs[i])


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_int_payload_packing_exact(dtype):
    """gid/count payloads ride float RDMA buffers exactly (bitcast for f32,
    numeric cast for f64), including EMPTY_GID = 2^31 - 1."""
    from comd_tpu.ops.binning import EMPTY_GID
    v = jnp.asarray(
        np.array([[0, 1, -5, EMPTY_GID, 2**30, 12345678]], np.int32))
    out = _unpack_ints(_pack_ints(v, dtype), dtype)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(v))


def test_atom_buffer_ring_push_roundtrip():
    """The packed [8, n, A] atom buffer (r, p, bitcast gid, counts) of
    exchange_atoms_ki moves intact through the kernel push."""
    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("x",))
    rng = np.random.RandomState(3)
    buf = rng.randn(n * 8, 6, 4, 16).astype(np.float32)
    gid = rng.randint(0, 2**31 - 1, (n * 8, 1, 4, 16)).astype(np.int32)
    packed = jnp.concatenate(
        [jnp.asarray(buf),
         _pack_ints(jnp.asarray(gid), jnp.float32),
         jnp.asarray(buf[:, :1])], axis=1)      # [n*8, 8, 4, 16]

    def body(xs):
        return _ring_push(xs, "x", +1, interpret=True,
                          collective_id=9, single_axis=True)

    out = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P("x"),),
                                out_specs=P("x"), check_vma=False))(packed)
    out = np.asarray(out).reshape(n, 8, 8, 4, 16)
    ref = np.asarray(packed).reshape(n, 8, 8, 4, 16)
    for i in range(n):
        np.testing.assert_array_equal(out[(i + 1) % n], ref[i])
    # int lanes decode exactly after the trip
    got_gid = np.asarray(_unpack_ints(
        jnp.asarray(out[1, :, 6:7]), jnp.float32))
    np.testing.assert_array_equal(got_gid, gid.reshape(n, 8, 1, 4, 16)[0])


def test_fused_pass2_push_computes_df_and_moves():
    """The fused kernel (comm_ki.cuh:187-310 analog) computes dF(rhobar)
    IN-KERNEL and posts it to the neighbor: local output must equal the
    XLA evaluator's dF bit-for-bit (interpret mode executes the same jnp
    ops), and the received plane must be the neighbor's values."""
    from comd_tpu.parallel.pallas_comm import make_df_eval_for_kernel
    from comd_tpu.potentials.eam import init_eam_pot

    pot = init_eam_pot("pots", "Cu_u6.eam", "funcfl")
    eval_df, consts = make_df_eval_for_kernel(pot, jnp.float32)

    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("x",))
    rng = np.random.RandomState(7)
    lo, hi = pot.f.x0, pot.f.x0 + (pot.f.n - 1) / pot.f.inv_dx
    rho = jnp.asarray(
        rng.uniform(lo, hi, (n * 8, 16)).astype(np.float32))

    def body(xs):
        dfe, recv = _pass2_push(xs, eval_df, "x", +1, interpret=True,
                                collective_id=11, single_axis=True,
                                consts=consts)
        return dfe, recv

    dfe, recv = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P("x"),),
        out_specs=(P("x"), P("x")), check_vma=False))(rho)
    # the evaluator's contract is an [N, 1] column (reshape-free Mosaic
    # lowering); _pass2_push does this flattening internally
    want = np.asarray(eval_df(rho.reshape(-1, 1), *consts)).reshape(rho.shape)
    # in-kernel vs XLA evaluation may contract FMAs differently: <= 1 ulp
    np.testing.assert_allclose(np.asarray(dfe), want, rtol=1e-6)
    got = np.asarray(recv).reshape(n, 8, 16)
    ref = np.asarray(dfe).reshape(n, 8, 16)
    # the received plane is exactly what the neighbor's kernel computed
    for i in range(n):
        np.testing.assert_array_equal(got[(i + 1) % n], ref[i])
