"""Link-cell geometry invariants (vs src-mpi/linkCells.c semantics)."""
import numpy as np
import pytest

from comd_tpu import cells


@pytest.fixture(scope="module")
def geom():
    return cells.make_geometry(np.zeros(3), np.array([20.0, 25.0, 30.0]), 4.9)


def test_grid_and_counts(geom):
    gx, gy, gz = geom.grid
    assert (gx, gy, gz) == (4, 5, 6)  # floor(extent/cutoff)
    assert geom.n_local == gx * gy * gz
    # nHaloBoxes formula (linkCells.c:145-147)
    assert geom.n_halo == 2 * ((gx + 2) * (gy + gz + 2) + gy * gz)
    assert geom.n_total == (gx + 2) * (gy + 2) * (gz + 2)


def test_tuple_roundtrip(geom):
    """box_from_tuple(tuple_of_box(b)) == b for every box, halo included."""
    t = geom.tuple_of_box
    ids = geom.box_from_tuple(t[:, 0], t[:, 1], t[:, 2])
    assert np.array_equal(ids, np.arange(geom.n_total))


def test_halo_ordering_matches_reference(geom):
    """x-plane halo cells come first, then y, then z (linkCells.c:99-109)."""
    gx, gy, gz = geom.grid
    n = geom.n_local
    # first halo box is (-1, 1-1.. ) per getTuple: ix=-1 block of gy*gz
    first_x = geom.box_from_tuple(np.array([-1]), np.array([0]), np.array([0]))
    assert n <= first_x[0] < n + 2 * gy * gz


def test_neighbor_map(geom):
    nbr = geom.nbr_map
    assert nbr.shape == (geom.n_local, 27)
    # self is neighbor 13 (loop order -1..1 over x,y,z; linkCells.c:202-214)
    assert np.array_equal(nbr[:, 13], np.arange(geom.n_local))
    # all 27 distinct when grid >= 3 on each axis
    assert all(len(np.unique(row)) == 27 for row in nbr)


def test_halo_mirror_and_shift(geom):
    """Each halo cell mirrors the periodic image interior cell."""
    t = geom.tuple_of_box[geom.n_local:]
    src = geom.halo_src
    shift = geom.halo_shift
    gx, gy, gz = geom.grid
    src_t = geom.tuple_of_box[src]
    assert np.array_equal(src_t, np.stack(
        [t[:, 0] % gx, t[:, 1] % gy, t[:, 2] % gz], axis=1))
    ext = geom.local_max - geom.local_min
    for a in range(3):
        expect = np.where(t[:, a] == -1, -ext[a],
                          np.where(t[:, a] == geom.grid[a], ext[a], 0.0))
        assert np.array_equal(shift[:, a], expect)


def test_box_from_coord_ownership(geom):
    """Atoms exactly on localMax go to halo; below stay local
    (linkCells.c:448-480)."""
    eps = 1e-12
    r = np.array([
        [0.0, 0.0, 0.0],
        [geom.local_max[0] - eps, 1.0, 1.0],   # inside
        [geom.local_max[0], 1.0, 1.0],          # on boundary -> halo x+
    ])
    ids = cells.box_from_coord(geom, r)
    assert ids[0] < geom.n_local
    assert ids[1] < geom.n_local
    assert ids[2] >= geom.n_local
    assert np.array_equal(geom.tuple_of_box[ids[2]],
                          [geom.grid[0], 0, 0])


def test_hilbert_code_bijective():
    n = 4
    X, Y, Z = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    codes = cells.compute_hilbert_code(X.ravel(), Y.ravel(), Z.ravel())
    assert len(np.unique(codes)) == n ** 3
    assert codes.min() == 0 and codes.max() == n ** 3 - 1


def test_hilbert_geometry_roundtrip():
    g = cells.make_geometry(np.zeros(3), np.array([20.0, 20.0, 20.0]), 4.9,
                            use_hilbert=True)
    assert g.use_hilbert
    t = g.tuple_of_box
    ids = g.box_from_tuple(t[:, 0], t[:, 1], t[:, 2])
    assert np.array_equal(ids, np.arange(g.n_total))


def test_hilbert_matches_reference_curve():
    """Cross-check the vectorized Hilbert code against a scalar oracle that
    follows the reference algorithm (computeHilbertCode, linkCells.c:28-63:
    nbits=10, transform table {0,1,7,6,3,2,4,5}, per-bit swap/complement
    state transforms -- the public-domain curve the reference cites)."""
    def oracle(x, y, z):
        transform = [0, 1, 7, 6, 3, 2, 4, 5]
        s = 0
        for i in range(9, -1, -1):
            xi, yi, zi = (x >> i) & 1, (y >> i) & 1, (z >> i) & 1
            index = (xi << 2) + (yi << 1) + zi
            s = (s << 3) + transform[index]
            if index == 0:
                y, z = z, y
            elif index in (1, 5):
                x, y = y, x
            elif index == 2:
                y, z = ~z, ~y
            elif index in (3, 7):
                x, y = ~y, ~x
            elif index in (4, 6):
                x, z = ~x, ~z
        return s

    rng = np.random.RandomState(42)
    xs = rng.randint(0, 1024, 200)
    ys = rng.randint(0, 1024, 200)
    zs = rng.randint(0, 1024, 200)
    got = cells.compute_hilbert_code(xs, ys, zs)
    want = np.array([oracle(int(x), int(y), int(z))
                     for x, y, z in zip(xs, ys, zs)])
    np.testing.assert_array_equal(got, want)
    # plus the exhaustive small grid: curve values, not just bijectivity
    X, Y, Z = np.meshgrid(np.arange(4), np.arange(4), np.arange(4),
                          indexing="ij")
    got = cells.compute_hilbert_code(X.ravel(), Y.ravel(), Z.ravel())
    want = np.array([oracle(int(x), int(y), int(z))
                     for x, y, z in zip(X.ravel(), Y.ravel(), Z.ravel())])
    np.testing.assert_array_equal(got, want)
