"""Interpolation-table numerics vs. a direct scalar port of the reference
(interpolate, src-mpi/eam.c:557-579; spline, gpu_utility.c:377-430)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from comd_tpu.potentials import tables


def scalar_interpolate(padded, n, x0, inv_dx, r):
    """Line-for-line scalar port of eam.c:557-579 for cross-checking.

    At the ii==n clamp the reference reads tt[ii+2] past the table (the value
    is multiplied by frac==0 so it never matters); emulate with a clamped
    read, as the vectorized gather does.
    """
    tt = lambda i: padded[min(i + 1, n + 2)]  # padded[k] == values[k-1]
    if r < x0:
        r = x0
    r = (r - x0) * inv_dx
    ii = math.floor(r)
    if ii > n:
        ii = n
        r = n / inv_dx
    r = r - math.floor(r)
    g1 = tt(ii + 1) - tt(ii - 1)
    g2 = tt(ii + 2) - tt(ii)
    f = tt(ii) + 0.5 * r * (g1 + r * (tt(ii + 1) + tt(ii - 1) - 2.0 * tt(ii)))
    df = 0.5 * (g1 + r * (g2 - g1)) * inv_dx
    return f, df


@pytest.fixture(scope="module")
def table():
    n, x0, dx = 50, 0.0, 0.1
    xs = x0 + np.arange(n) * dx
    data = np.sin(xs) + 0.3 * xs ** 2
    return tables.InterpTable.from_data(n, x0, dx, data)


def test_quadratic_matches_scalar_port(table):
    rs = np.concatenate([np.linspace(-0.5, 6.0, 199), [0.0, 4.9, 5.0, 5.3]])
    dev = table.values_device(jnp.float64)
    f, df = tables.interpolate(dev, table.n, table.x0, table.inv_dx,
                               jnp.asarray(rs))
    for i, r in enumerate(rs):
        fs, dfs = scalar_interpolate(table.padded, table.n, table.x0,
                                     table.inv_dx, r)
        assert float(f[i]) == pytest.approx(fs, abs=1e-14)
        assert float(df[i]) == pytest.approx(dfs, abs=1e-12)


def test_quadratic_accuracy(table):
    rs = np.linspace(0.2, 4.5, 97)
    dev = table.values_device(jnp.float64)
    f, df = tables.interpolate(dev, table.n, table.x0, table.inv_dx,
                               jnp.asarray(rs))
    truth = np.sin(rs) + 0.3 * rs ** 2
    dtruth = np.cos(rs) + 0.6 * rs
    np.testing.assert_allclose(f, truth, atol=2e-3)
    np.testing.assert_allclose(df, dtruth, atol=2e-2)


def test_spline_value_and_derivative(table):
    """Spline in r^2: values interpolate the knots; df = (1/r) dF/dr."""
    sp = tables.make_spline(table.padded[1:], table.n, table.x0, table.inv_dx)
    coeffs = jnp.asarray(sp.coeffs)
    # at knot radii the spline must reproduce the table values
    ks = np.arange(1, table.n - 1)
    rk = table.x0 + ks / table.inv_dx
    f, _ = tables.interpolate_spline(coeffs, sp.n, sp.x0, sp.xn, sp.inv_dx,
                                     jnp.asarray(rk ** 2))
    np.testing.assert_allclose(f, table.padded[1:][ks], atol=1e-10)
    # derivative check between knots against the analytic function.
    # (the r^2-space spline is inherently poor as r -> 0 where
    # d f / d(r^2) diverges -- below the physical potential range -- so
    # check the mid-range only, as the reference kernels effectively do.)
    rs = np.linspace(0.8, 4.2, 57)
    f, df = tables.interpolate_spline(coeffs, sp.n, sp.x0, sp.xn, sp.inv_dx,
                                      jnp.asarray(rs ** 2))
    dtruth = np.cos(rs) + 0.6 * rs
    np.testing.assert_allclose(f, np.sin(rs) + 0.3 * rs ** 2, atol=5e-3)
    np.testing.assert_allclose(df * rs, dtruth, atol=5e-2)
