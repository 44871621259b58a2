"""Tabulated-function interpolation for EAM / interpolated-LJ.

Two schemes, matching the reference's numerics:

1. Quadratic value + 4-point finite-difference derivative on a uniform grid
   (``interpolate``, src-mpi/eam.c:557-579).  The table carries one padding
   value on each side (values[-1]=values[0], values[n]=values[n+1]=values[n-1],
   eam.c:515-517) so the stencil never branches.

2. Cubic spline in r^2 (avoids the sqrt in the hot loop), coefficients built
   Numerical-Recipes style with y''=0 at the left end and y'=0 at the right
   end (initSplineCoefficients, src-mpi/gpu_utility.c:377-430; evaluation
   interpolateSpline, src-mpi/gpu_common.h:95-129).

Both evaluate as pure jnp so they vectorize over pair tensors and fuse into
the Pallas/XLA force kernels.  Tables are tiny (<=1000 entries) and live in
VMEM on TPU.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class InterpTable:
    """Uniform-grid quadratic-interpolation table (eam.c:496-519)."""

    n: int
    x0: float
    inv_dx: float
    padded: np.ndarray  # [n+3] f64; padded[k] == reference values[k-1]

    @staticmethod
    def from_data(n: int, x0: float, dx: float, data: np.ndarray) -> "InterpTable":
        data = np.asarray(data, dtype=np.float64)
        assert data.shape == (n,)
        padded = np.empty(n + 3, dtype=np.float64)
        padded[1:n + 1] = data
        padded[0] = data[0]           # values[-1] = values[0]
        padded[n + 1] = data[n - 1]   # values[n]   = values[n-1]
        padded[n + 2] = data[n - 1]   # values[n+1] = values[n-1]
        return InterpTable(n=n, x0=float(x0), inv_dx=1.0 / float(dx), padded=padded)

    def values_device(self, dtype) -> jnp.ndarray:
        return jnp.asarray(self.padded, dtype=dtype)

    def stencil_device(self, dtype) -> jnp.ndarray:
        """[n+1, 4] row-stencil matrix: row i = values[i-1 .. i+2], so one
        row gather yields the whole 4-point stencil (fewer, wider gathers
        lower better on TPU than 4 scalar gathers per pair)."""
        pad4 = np.concatenate([self.padded, self.padded[-1:]])
        idx = np.arange(self.n + 1)[:, None] + np.arange(4)[None, :]
        return jnp.asarray(pad4[idx], dtype=dtype)


def interpolate(padded, n: int, x0: float, inv_dx: float, r):
    """Vectorized quadratic interpolation (eam.c:557-579).

    ``padded`` is the device-resident [n+3] table; ``r`` any-shaped array.
    Returns (f, df/dr).
    """
    r = jnp.maximum(r, x0)
    rr = (r - x0) * inv_dx
    ii = jnp.floor(rr).astype(jnp.int32)
    over = ii > n
    ii = jnp.minimum(ii, n)
    frac = jnp.where(over, 0.0, rr - jnp.floor(rr)).astype(padded.dtype)

    tm1 = padded[ii]          # values[ii-1]
    t0 = padded[ii + 1]       # values[ii]
    t1 = padded[ii + 2]       # values[ii+1]
    t2 = padded[ii + 3]       # values[ii+2]
    g1 = t1 - tm1
    g2 = t2 - t0
    f = t0 + 0.5 * frac * (g1 + frac * (t1 + tm1 - 2.0 * t0))
    df = 0.5 * (g1 + frac * (g2 - g1)) * inv_dx
    return f, df


def interpolate4(stencil, n: int, x0: float, inv_dx: float, r):
    """Quadratic interpolation via the [n+1, 4] row-stencil matrix.

    Numerically identical to interpolate(); one row gather per evaluation.
    """
    r = jnp.maximum(r, x0)
    rr = (r - x0) * inv_dx
    ii = jnp.floor(rr).astype(jnp.int32)
    over = ii > n
    ii = jnp.minimum(ii, n)
    frac = jnp.where(over, 0.0, rr - jnp.floor(rr)).astype(stencil.dtype)

    row = stencil[ii]                 # [..., 4]
    tm1 = row[..., 0]
    t0 = row[..., 1]
    t1 = row[..., 2]
    t2 = row[..., 3]
    g1 = t1 - tm1
    g2 = t2 - t0
    f = t0 + 0.5 * frac * (g1 + frac * (t1 + tm1 - 2.0 * t0))
    df = 0.5 * (g1 + frac * (g2 - g1)) * inv_dx
    return f, df


def pack_twolevel(tabs: list["InterpTable"], block_rows: int = 8):
    """Pack one or more same-grid tables into the two-level lookup matrix.

    T2[nb, block_rows * 4 * len(tabs)]: block b, row j holds the 4-point
    stencils of entry ii = b*block_rows + j for every table, concatenated.
    Rows past n clamp to the last entry (frac is 0 there, values unused).
    """
    n = tabs[0].n
    assert all(t.n == n and t.inv_dx == tabs[0].inv_dx for t in tabs)
    nb = -(-(n + 1) // block_rows)
    nb = -(-nb // 8) * 8  # pad the block axis to a sublane multiple: odd
    # nb (e.g. 63) breaks the one-hot/matmul fusion and costs ~7x
    width = 4 * len(tabs)
    out = np.zeros((nb, block_rows * width), dtype=np.float64)
    for b in range(nb):
        for j in range(block_rows):
            ii = min(b * block_rows + j, n)
            for t, tab in enumerate(tabs):
                pad4 = np.concatenate([tab.padded, tab.padded[-1:]])
                out[b, j * width + 4 * t: j * width + 4 * t + 4] = \
                    pad4[ii:ii + 4]
    return out, nb


def interpolate_twolevel(T2, nb: int, block_rows: int, n_tabs: int,
                         n: int, x0: float, inv_dx: float, r,
                         batch: int = 4096):
    """Gather-free quadratic interpolation: two-level one-hot lookup.

    Per-element table gathers run at ~0.2 G/s on TPU via XLA; this
    formulation fetches the whole candidate block with a one-hot matmul on
    the MXU (~9.5 G-lookups/s measured on v5e, docs/BENCHMARKS.md) and
    selects the row with a mask-weighted sum -- no gathers anywhere.
    Requires precision=HIGHEST so the f32 table values survive the MXU's
    bf16 passes (one-hot entries are exact in any precision).

    Returns a list of (f, df) per packed table.  Same numerics as
    interpolate() up to <=1 ulp from the matmul reconstruction.
    """
    dtype = T2.dtype
    shape = jnp.shape(r)
    width = 4 * n_tabs

    # Batch internally and do ALL the work (index math, one-hot, matmul,
    # row-select, quadratic combine) inside the map body: XLA then fuses
    # everything around the matmul and only the final (f, df) arrays touch
    # HBM (measured ~9.5 G-lookups/s at 4096-row bodies on v5e; any
    # intermediate [N, nb] or [N, width] array round-trips HBM and costs
    # 10x).
    rf = jnp.reshape(r, (-1,))
    N = rf.shape[0]
    nbat = -(-N // batch)
    pad = nbat * batch - N
    rb = jnp.pad(rf, (0, pad)).reshape(nbat, batch)

    def body(r_b):
        r_b = jnp.maximum(r_b, x0)
        rr = (r_b - x0) * inv_dx
        ii = jnp.floor(rr).astype(jnp.int32)
        over = ii > n
        ii = jnp.minimum(ii, n)
        frac = jnp.where(over, 0.0, rr - jnp.floor(rr)).astype(dtype)

        # power-of-two block_rows: shift/mask instead of div/mod (integer
        # division lowers expensively on the VPU)
        assert block_rows & (block_rows - 1) == 0
        shift = block_rows.bit_length() - 1
        hi = ii >> shift
        lo = ii & (block_rows - 1)
        oh = (hi[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :]
              ).astype(dtype)
        fetched = jax.lax.dot(oh, T2, precision=jax.lax.Precision.HIGHEST)
        sel = (lo[:, None] == jnp.arange(
            block_rows, dtype=jnp.int32)[None, :]).astype(dtype)
        vals = jnp.sum(
            fetched.reshape(-1, block_rows, width) * sel[:, :, None], axis=1)

        outs = []
        for t in range(n_tabs):
            tm1 = vals[:, 4 * t + 0]
            t0 = vals[:, 4 * t + 1]
            t1 = vals[:, 4 * t + 2]
            t2 = vals[:, 4 * t + 3]
            g1 = t1 - tm1
            g2 = t2 - t0
            outs.append(t0 + 0.5 * frac * (g1 + frac * (t1 + tm1 - 2.0 * t0)))
            outs.append(0.5 * (g1 + frac * (g2 - g1)) * inv_dx)
        return tuple(outs)

    flat_outs = jax.lax.map(body, rb)   # each [nbat, batch]
    outs = []
    for t in range(n_tabs):
        f = flat_outs[2 * t].reshape(-1)[:N].reshape(shape)
        df = flat_outs[2 * t + 1].reshape(-1)[:N].reshape(shape)
        outs.append((f, df))
    return outs


@dataclasses.dataclass(frozen=True)
class SplineTable:
    """Cubic-spline-in-r^2 table (gpu_utility.c:377-430, gpu_common.h:95-129).

    ``coeffs[i] = (a, b, c, d)`` with f(r2) = ((a*r2 + b)*r2 + c)*r2 + d on
    interval i, and (1/r) df/dr = 2*((3*a*r2 + 2*b... expressed exactly as the
    reference: df = 2*((3*(a*r2+b) - b)*r2 + c).
    """

    n: int
    x0: float
    xn: float
    inv_dx: float
    coeffs: np.ndarray  # [n, 4] f64


def make_spline(values: np.ndarray, n: int, x0: float, inv_dx: float) -> SplineTable:
    """Build spline coefficients over knots x_i = (x0 + i/invDx)^2.

    Port of the reference tridiagonal sweep (gpu_utility.c:377-430): natural
    (y''=0) at the left end, clamped (y'=0) at the right end.  ``values`` must
    have at least n+1 entries (the reference reads values[n]).
    """
    values = np.asarray(values, dtype=np.float64)
    assert values.shape[0] >= n + 1
    dx = 1.0 / inv_dx
    xs = (x0 + np.arange(n + 2) * dx) ** 2  # knots in r^2 space

    u = np.zeros(n, dtype=np.float64)
    y2 = np.zeros(n + 1, dtype=np.float64)
    for i in range(1, n):
        xi, xp, xn_ = xs[i], xs[i - 1], xs[i + 1]
        sig = (xi - xp) / (xn_ - xp)
        p = sig * y2[i - 1] + 2.0
        y2[i] = (sig - 1.0) / p
        ui = (values[i + 1] - values[i]) / (xn_ - xi) - \
            (values[i] - values[i - 1]) / (xi - xp)
        u[i] = (6.0 * ui / (xn_ - xp) - sig * u[i - 1]) / p
    xn_, xnp = xs[n], xs[n - 1]
    qn = 0.5
    un = (-3.0 / (xn_ - xnp)) * (values[n] - values[n - 1]) / (xn_ - xnp)
    y2[n] = (un - qn * u[n - 1]) / (qn * y2[n - 1] + 1.0)
    for i in range(n - 1, -1, -1):
        y2[i] = y2[i] * y2[i + 1] + u[i]

    coeffs = np.zeros((n, 4), dtype=np.float64)
    for i in range(n):
        x1, x2 = xs[i], xs[i + 1]
        d2y1, d2y2 = y2[i], y2[i + 1]
        y1v, y2v = values[i], values[i + 1]
        h = x2 - x1
        coeffs[i, 0] = (d2y2 - d2y1) / (6.0 * h)
        coeffs[i, 1] = (x2 * d2y1 - x1 * d2y2) / (2.0 * h)
        coeffs[i, 2] = (1.0 / h) * (
            (-3 * x2 * x2 + h * h) * d2y1 / 6.0
            + (3 * x1 * x1 - h * h) * d2y2 / 6.0
            - y1v + y2v)
        coeffs[i, 3] = (1.0 / h) * (
            x2 * y1v - x1 * y2v
            + d2y1 * (x2 ** 3 - x2 * h * h) / 6.0
            + d2y2 * (-x1 ** 3 + x1 * h * h) / 6.0)
    return SplineTable(n=n, x0=float(x0), xn=float(x0 + n * dx),
                       inv_dx=float(inv_dx), coeffs=coeffs)


def interpolate_spline(coeffs, n: int, x0: float, xn: float, inv_dx: float, r2):
    """Vectorized spline evaluation on r^2 (gpu_common.h:95-129).

    Returns (f, df) where df = (1/r) * df/dr (the force kernels multiply by
    the displacement vector directly, saving the normalization).
    """
    r = jnp.sqrt(r2)
    r = jnp.clip(r, x0, xn)
    idx = jnp.floor(r * inv_dx - x0 * inv_dx).astype(jnp.int32)
    idx = jnp.clip(idx, 0, n - 1)
    a = coeffs[idx, 0]
    b = coeffs[idx, 1]
    c = coeffs[idx, 2]
    d = coeffs[idx, 3]
    tmp = a * r2 + b
    f = (tmp * r2 + c) * r2 + d
    df = 2.0 * ((3.0 * tmp - b) * r2 + c)
    return f, df
