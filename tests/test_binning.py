"""Rebucketing: canonical (cell,gid) redistribution replacing
UpdateLinkCells/CompactAtoms/sortAtomsGpu (src-mpi/gpu_redistribute.h,
gpu_kernels.cu:1013-1043)."""
import jax.numpy as jnp
import numpy as np
import pytest

from comd_tpu import cells
from comd_tpu.ops import binning


@pytest.fixture(scope="module")
def geom():
    return cells.make_geometry(np.zeros(3), np.array([20.0, 20.0, 20.0]), 4.9)


def random_state(geom, n, A, seed=0):
    rng = np.random.default_rng(seed)
    B = geom.n_total
    r = np.full((3, B, A), binning.EMPTY_POS)
    p = np.zeros((3, B, A))
    gid = np.full((B, A), binning.EMPTY_GID, np.int32)
    n_atoms = np.zeros((B,), np.int32)
    # scatter n atoms at random positions into arbitrary local slots
    pos = rng.uniform(0, 20.0, size=(n, 3))
    box = rng.integers(0, geom.n_local, size=n)  # wrong on purpose
    for i in range(n):
        b = box[i]
        k = n_atoms[b]
        if k >= A:
            continue
        r[:, b, k] = pos[i]
        p[:, b, k] = rng.normal(size=3)
        gid[b, k] = i
        n_atoms[b] += 1
    return (jnp.asarray(r), jnp.asarray(p), jnp.asarray(gid),
            jnp.asarray(n_atoms))


def test_rebucket_canonicalizes(geom):
    A = 16
    r, p, gid, n_atoms = random_state(geom, 300, A)
    ext = np.array([20.0, 20.0, 20.0])
    r2, p2, gid2, counts, nmig, ovf = binning.rebucket(
        geom, r, p, gid, n_atoms, wrap_extent=ext)
    assert not bool(ovf)
    assert int(nmig) == 0
    assert int(counts[:geom.n_local].sum()) == 300
    assert int(counts[geom.n_local:].sum()) == 0
    r2, gid2, counts = map(np.asarray, (r2, gid2, counts))
    # every atom is in the box its coordinates dictate, gid-sorted, compacted
    for b in range(geom.n_local):
        k = counts[b]
        g = gid2[b, :k]
        assert np.all(np.diff(g) > 0), "gid order within cell"
        assert np.all(gid2[b, k:] == binning.EMPTY_GID)
        if k:
            got = cells.box_from_coord(geom, r2[:, b, :k].T)
            assert np.all(got == b)


def test_rebucket_idempotent(geom):
    A = 16
    r, p, gid, n_atoms = random_state(geom, 300, A, seed=3)
    ext = np.array([20.0, 20.0, 20.0])
    out1 = binning.rebucket(geom, r, p, gid, n_atoms, wrap_extent=ext)
    out2 = binning.rebucket(geom, out1[0], out1[1], out1[2], out1[3],
                            wrap_extent=ext)
    for a, b in zip(out1[:4], out2[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rebucket_overflow_detected(geom):
    A = 4
    B = geom.n_total
    # 8 atoms all in the same spatial cell but capacity 4
    r = np.full((3, B, A), binning.EMPTY_POS)
    p = np.zeros((3, B, A))
    gid = np.full((B, A), binning.EMPTY_GID, np.int32)
    n_atoms = np.zeros((B,), np.int32)
    for b in range(2):
        for k in range(A):
            r[:, b, k] = 1.0 + 0.1 * (b * A + k)
            gid[b, k] = b * A + k
        n_atoms[b] = A
    *_, ovf = binning.rebucket(geom, jnp.asarray(r), jnp.asarray(p),
                               jnp.asarray(gid), jnp.asarray(n_atoms),
                               wrap_extent=np.full(3, 20.0))
    assert bool(ovf)


def test_wrap_pbc_boundary_exact():
    ext = np.array([10.0, 10.0, 10.0])
    r = jnp.asarray(np.array([[-1e-18, 10.0, 9.999999, -0.5, 10.5]] * 3))
    w = np.asarray(binning.wrap_pbc(r, ext))
    # [0, L] closed on the right: the r==L fp edge case is folded back by
    # rebucket() through the halo map, not by the wrap itself.
    assert np.all((w >= 0) & (w <= 10.0))
    assert w[0, 3] == pytest.approx(9.5)
    assert w[0, 4] == pytest.approx(0.5)


def test_rebucket_folds_boundary_atom(geom):
    """An atom whose wrapped coordinate lands exactly on L is owned by the
    periodic-image cell (serial self-exchange semantics)."""
    A = 8
    B = geom.n_total
    r = np.full((3, B, A), binning.EMPTY_POS)
    p = np.zeros((3, B, A))
    gid = np.full((B, A), binning.EMPTY_GID, np.int32)
    n_atoms = np.zeros((B,), np.int32)
    r[:, 0, 0] = [20.0, 5.0, 5.0]   # exactly on the +x boundary
    gid[0, 0] = 5
    n_atoms[0] = 1
    ext = np.full(3, 20.0)
    r2, p2, gid2, counts, nmig, ovf = binning.rebucket(
        geom, jnp.asarray(r), jnp.asarray(p), jnp.asarray(gid),
        jnp.asarray(n_atoms), wrap_extent=ext)
    counts = np.asarray(counts)
    assert int(nmig) == 0 and not bool(ovf)
    assert counts.sum() == 1
    b = int(np.flatnonzero(counts)[0])
    assert b < geom.n_local
    # owned by an x=0 cell with coordinate shifted to ~0
    assert geom.tuple_of_box[b][0] == 0
    assert abs(float(np.asarray(r2)[0, b, 0])) < 1e-9


def test_halo_fill(geom):
    A = 8
    B = geom.n_total
    r = np.full((3, B, A), binning.EMPTY_POS)
    gid = np.full((B, A), binning.EMPTY_GID, np.int32)
    n_atoms = np.zeros((B,), np.int32)
    # one atom in the corner local cell (0,0,0)
    r[:, 0, 0] = [0.1, 0.2, 0.3]
    gid[0, 0] = 77
    n_atoms[0] = 1
    r2, gid2, n2 = binning.fill_halo_serial(
        geom, jnp.asarray(r), jnp.asarray(gid), jnp.asarray(n_atoms))
    r2, gid2, n2 = map(np.asarray, (r2, gid2, n2))
    # cell (0,0,0)'s periodic image lives in the (gx,gy,gz) corner halo cell,
    # shifted by +extent on every axis
    g = geom.grid
    hid = int(geom.box_from_tuple(np.array([g[0]]), np.array([g[1]]),
                                  np.array([g[2]]))[0])
    assert n2[hid] == 1
    assert gid2[hid, 0] == 77
    np.testing.assert_allclose(r2[:, hid, 0],
                               np.array([0.1, 0.2, 0.3]) + 20.0)
