"""Kernel-initiated RDMA halo transport (comm_ki analog).

Interpret mode only discharges remote DMAs on single-named-axis meshes, so
the ring-push primitive is validated on a 1D mesh here; the full 3-axis
exchange_scalar_ki compiles for real TPU meshes (comm_impl='ki')."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from comd_tpu.parallel.pallas_comm import _ring_push

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
