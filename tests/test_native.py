"""Native C++ scene kernels must be bit-identical to the numpy RNG path."""
import numpy as np
import pytest

from comd_tpu import rng, lattice
from comd_tpu.utils import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_gasdev3_matches_numpy_to_ulp():
    """numpy's SIMD log differs from glibc log by 1 ulp in ~0.1% of inputs;
    the C++ path (glibc, as the reference binary used) is canonical, the
    numpy fallback is documented as 1-ulp-close."""
    gid = np.arange(5000, dtype=np.int64)
    c = native.gasdev3(gid, 123)
    py = rng.gasdev_n(gid.astype(np.uint64), 123, 3).T
    np.testing.assert_allclose(c, py, rtol=5e-16, atol=0)
    assert (c == py).mean() > 0.99


def test_uniform3_bit_identical():
    gid = np.arange(5000, dtype=np.int64) * 7 + 3
    c = native.uniform3(gid, 457)
    py = rng.uniform_n(gid.astype(np.uint64), 457, 3).T
    np.testing.assert_array_equal(c, py)


def test_fcc_lattice_matches_numpy():
    lo = np.zeros(3)
    hi = np.array([5, 4, 3]) * 3.615
    rc, gc = native.fcc_lattice(5, 4, 3, 3.615, lo, hi)
    # numpy reference path
    from comd_tpu.lattice import create_fcc_lattice
    import comd_tpu.utils.native as nat
    saved = nat._lib
    nat._lib = None
    nat._tried = True
    try:
        rp, gp = create_fcc_lattice(5, 4, 3, 3.615, lo, hi)
    finally:
        nat._lib = saved
        nat._tried = True
    order_c = np.argsort(gc, kind="stable")
    np.testing.assert_array_equal(gc[order_c], gp)
    np.testing.assert_array_equal(rc[order_c], rp)
