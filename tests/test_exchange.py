"""Exchange-plan invariants (parallel/exchange.py static cell lists)."""
import numpy as np
import pytest

from comd_tpu import cells
from comd_tpu.parallel import exchange


@pytest.fixture(scope="module")
def geom():
    return cells.make_geometry(np.zeros(3), np.array([20.0, 24.0, 28.0]), 4.9)


@pytest.fixture(scope="module")
def plan(geom):
    return exchange.make_plan(geom)


def test_atom_send_planes_cover_boundaries(geom, plan):
    """Each axis ships exactly the 2+2 extended planes, both directions."""
    t = geom.tuple_of_box
    g = geom.grid
    for axis in range(3):
        minus, plus = plan.atom_send[axis]
        assert set(np.unique(t[minus, axis])) == {-1, 0}
        assert set(np.unique(t[plus, axis])) == {g[axis] - 1, g[axis]}
        # extended cross-section: all transverse coords present
        for a in range(3):
            if a == axis:
                continue
            assert t[minus, a].min() == -1 and t[minus, a].max() == g[a]


def test_force_lists_slot_aligned(geom, plan):
    """Force send/recv lists must be mirrored cell-for-cell: recv[i] is the
    halo cell whose tuple equals send[i]'s shifted by +-grid along the axis
    (the slot-aligned dfEmbed copy depends on this ordering)."""
    t = geom.tuple_of_box
    g = geom.grid
    for axis in range(3):
        send_m, send_p = plan.force_send[axis]
        recv_m, recv_p = plan.force_recv[axis]
        assert len(send_m) == len(recv_p) == len(send_p) == len(recv_m)
        # my recv_p (halo at +g) receives the plus neighbor's send_m (ix==0):
        # transverse tuples must match pairwise
        for a in range(3):
            if a == axis:
                continue
            np.testing.assert_array_equal(t[send_m, a], t[recv_p, a])
            np.testing.assert_array_equal(t[send_p, a], t[recv_m, a])
        assert np.all(t[recv_p, axis] == g[axis])
        assert np.all(t[recv_m, axis] == -1)
        assert np.all(t[send_m, axis] == 0)
        assert np.all(t[send_p, axis] == g[axis] - 1)


def test_growing_cross_section(geom, plan):
    """Force-exchange cross-sections grow x -> y -> z (haloExchange.c:345-475)."""
    t = geom.tuple_of_box
    g = geom.grid
    # x stage: transverse local-only
    send_m, _ = plan.force_send[0]
    assert t[send_m, 1].min() == 0 and t[send_m, 1].max() == g[1] - 1
    assert t[send_m, 2].min() == 0 and t[send_m, 2].max() == g[2] - 1
    # y stage: x-extended, z local
    send_m, _ = plan.force_send[1]
    assert t[send_m, 0].min() == -1 and t[send_m, 0].max() == g[0]
    assert t[send_m, 2].min() == 0 and t[send_m, 2].max() == g[2] - 1
    # z stage: fully extended
    send_m, _ = plan.force_send[2]
    assert t[send_m, 0].min() == -1 and t[send_m, 1].max() == g[1]


def test_boundary_lists_partition(geom):
    interior, boundary = cells.boundary_lists(geom, ring=1)
    assert len(interior) + len(boundary) == geom.n_local
    assert len(np.intersect1d(interior, boundary)) == 0
    t = geom.tuple_of_box
    g = geom.grid
    # every interior cell's 27-neighborhood stays local
    for a in range(3):
        assert t[interior, a].min() >= 1
        assert t[interior, a].max() <= g[a] - 2
