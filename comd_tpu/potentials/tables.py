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
                         batch: int = None):
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

    # f64 tables: the MXU has no f64 path (XLA emulates f64 dot in
    # software -- measured 48x slower than the f32 fetch on v5e, and the
    # emulation crashes the TPU worker at production sizes).  Fetch through
    # TWO f32 planes instead: hi = f32(T2), lo = f32(T2 - hi).  One-hot
    # selection through an f32 dot returns each plane's entries exactly
    # (HIGHEST precision reconstructs f32 operands), so hi + lo recovers
    # the f64 table values to the double-f32 representation (~2^-49
    # relative, below the 1e-9 golden tolerance by 6 orders).
    split_f64 = dtype == jnp.float64
    if split_f64:
        T2_hi = T2.astype(jnp.float32)
        T2_lo = (T2 - T2_hi.astype(jnp.float64)).astype(jnp.float32)

    # Batch internally and do ALL the work (index math, one-hot, matmul,
    # row-select, quadratic combine) inside the map body: XLA then fuses
    # everything around the matmul and only the final (f, df) arrays touch
    # HBM (measured ~9.5 G-lookups/s at 4096-row bodies on v5e; any
    # intermediate [N, nb] or [N, width] array round-trips HBM and costs
    # 10x).
    rf = jnp.reshape(r, (-1,))
    N = rf.shape[0]
    if batch is None:
        # body sizes are a latency/intermediate-size trade: 4096-row bodies
        # measured fastest per-lookup at pair-tensor N (callers there pass
        # batch=4096 explicitly), but each lax.map iteration is a serial
        # dispatch -- hundreds of them (e.g. pass-2 F(rhobar) at 1M atoms)
        # turn latency-bound.  Default: at most ~32 bodies, each <= 128k
        # rows (one-hot intermediate <= 33 MB).
        per_body = -(-N // 32)                      # ceil(N / 32 bodies)
        batch = min(max(4096, -(-per_body // 4096) * 4096), 131072)
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
        if split_f64:
            oh = (hi[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :]
                  ).astype(jnp.float32)
            fetched = (
                jax.lax.dot(oh, T2_hi,
                            precision=jax.lax.Precision.HIGHEST
                            ).astype(jnp.float64)
                + jax.lax.dot(oh, T2_lo,
                              precision=jax.lax.Precision.HIGHEST
                              ).astype(jnp.float64))
        else:
            oh = (hi[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :]
                  ).astype(dtype)
            fetched = jax.lax.dot(oh, T2,
                                  precision=jax.lax.Precision.HIGHEST)
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

    if nbat == 1:
        # single body: skip lax.map entirely.  Besides saving a trivial
        # scan, this keeps the evaluator usable INSIDE Pallas kernels
        # (Mosaic's scan lowering rejects extensive outputs) -- the fused
        # kernel-initiated dfEmbed push evaluates planes this way.
        flat_outs = tuple(o[None] for o in body(rb[0]))
    else:
        flat_outs = jax.lax.map(body, rb)   # each [nbat, batch]
    outs = []
    for t in range(n_tabs):
        f = flat_outs[2 * t].reshape(-1)[:N].reshape(shape)
        df = flat_outs[2 * t + 1].reshape(-1)[:N].reshape(shape)
        outs.append((f, df))
    return outs


def _sample_reference(tab: InterpTable, r: np.ndarray):
    """Reference quadratic interpolation (eam.c:557-579), f64 numpy.

    Returns (f, df/dr) on the sample points ``r`` -- the fit target for the
    Chebyshev representations below.
    """
    rc = np.maximum(r, tab.x0)
    rr = (rc - tab.x0) * tab.inv_dx
    ii = np.floor(rr).astype(np.int64)
    # over-end test BEFORE the clamp, matching interpolate() exactly: past
    # the table the value clamps to the last entry with frac = 0
    over = ii > tab.n
    ii = np.minimum(ii, tab.n)
    frac = np.where(over, 0.0, rr - np.floor(rr))
    pad4 = np.concatenate([tab.padded, tab.padded[-1:]])
    tm1, t0, t1, t2 = (pad4[ii + k] for k in range(4))
    g1, g2 = t1 - tm1, t2 - t0
    f = t0 + 0.5 * frac * (g1 + frac * (t1 + tm1 - 2.0 * t0))
    df = 0.5 * (g1 + frac * (g2 - g1)) * tab.inv_dx
    return f, df


@dataclasses.dataclass(frozen=True)
class ChebTable:
    """Single-interval Chebyshev-in-r^2 representation of an InterpTable.

    The TPU has no per-lane gather: every table-lookup scheme pays either
    per-element one-hot lane traffic (interpolate_twolevel) or XLA's slow
    gather lowering (interpolate4).  This representation removes the lookup
    entirely: f(u=r^2) is one global Chebyshev polynomial, evaluated by a
    Clenshaw FMA chain that vectorizes perfectly on the VPU and needs no
    memory access at all.  It is fit (at init, f64 least squares on a dense
    sample) to the reference quadratic interpolant (eam.c:557-579); for the
    shipped Cu tables, deg=20 over [2.0 A, cutoff] matches the interpolant
    to ~3e-6 rel (value) / ~3e-4 rel (derivative) -- the derivative floor is
    the interpolant's own knot noise (its df is only C0), so the fit is as
    close to the smooth physical function as the reference interpolant
    itself.  Because the returned derivative is the EXACT derivative of the
    returned value, velocity-Verlet conserves the (fitted) Hamiltonian just
    as well as the exact-table path conserves its own.

    Below r_lo the evaluation clamps to u_lo: energy constant, force from
    the (strongly repulsive) derivative at r_lo -- physical for pairs that
    should never occur at equilibrium.  Use the f64 'rows' path for golden
    validation; this is the f32 production path.
    """

    u_lo: float
    u_hi: float
    coef: np.ndarray    # [deg+1] f64 Chebyshev coefficients of f(u)
    dcoef: np.ndarray   # [deg]   f64 Chebyshev coefficients of df/du


def make_cheb(tab: InterpTable, r_lo: float, r_hi: float,
              deg=None, n_sample: int = 100001,
              tol_f: float = 5e-5, tol_df: float = 2e-3) -> ChebTable:
    """Fit a ChebTable to the reference interpolant of ``tab`` over
    [r_lo, r_hi] in u = r^2.

    ``deg=None`` picks the lowest degree from (16, 20, 24, 32) whose max
    relative error (vs the interpolant, f64) meets (tol_f, tol_df); rougher
    tables (e.g. Mishin setfl phi, whose 10k-knot data carries spline-knot
    wiggle) land at 32, smooth ones (Adams funcfl) at 16-20.
    """
    u_lo, u_hi = float(r_lo) ** 2, float(r_hi) ** 2
    u = np.linspace(u_lo, u_hi, n_sample)
    r = np.sqrt(u)
    f_ref, df_ref = _sample_reference(tab, r)   # (f, df/dr)

    degrees = (deg,) if deg is not None else (16, 20, 24, 32)
    best = None
    for d in degrees:
        cheb = np.polynomial.chebyshev.Chebyshev.fit(u, f_ref, d,
                                                     domain=[u_lo, u_hi])
        err_f = np.max(np.abs(cheb(u) - f_ref)) / np.max(np.abs(f_ref))
        err_df = np.max(np.abs(2.0 * r * cheb.deriv()(u) - df_ref)) \
            / np.max(np.abs(df_ref))
        best = cheb
        if err_f <= tol_f and err_df <= tol_df:
            break
    return ChebTable(u_lo=u_lo, u_hi=u_hi,
                     coef=np.asarray(best.coef, np.float64),
                     dcoef=np.asarray(best.deriv().coef, np.float64))


def interpolate_cheb(coef, dcoef, u_lo: float, u_hi: float, r2, rr=None):
    """Clenshaw evaluation of a ChebTable on u = r^2 arrays.

    Returns (f, df/dr) to match the interpolate4 contract (df/dr =
    2*r*dP/du); pass ``rr=None`` to get (f, (1/r)*df/dr = 2*dP/du) instead,
    which is what force kernels actually need (they multiply by the
    displacement vector) -- that form needs NO sqrt anywhere.
    """
    dtype = r2.dtype
    u = jnp.clip(r2, dtype.type(u_lo), dtype.type(u_hi))
    t2 = (u - dtype.type(0.5 * (u_lo + u_hi))) * dtype.type(
        4.0 / (u_hi - u_lo))   # 2*t, t in [-1, 1]

    def clenshaw(c):
        b0 = jnp.zeros_like(u)
        b1 = jnp.zeros_like(u)
        for k in range(len(c) - 1, 0, -1):
            b0, b1 = t2 * b0 - b1 + dtype.type(c[k]), b0
        return dtype.type(0.5) * t2 * b0 - b1 + dtype.type(c[0])

    f = clenshaw(coef)
    dfdu = clenshaw(dcoef)
    if rr is None:
        return f, 2.0 * dfdu
    return f, 2.0 * rr * dfdu


@dataclasses.dataclass(frozen=True)
class ChebFused:
    """Shared-basis Chebyshev fit of several same-domain tables.

    The EAM pair passes need up to four table evaluations per pair (phi,
    phi', rho, rho'): as four independent Clenshaw chains that is ~2 FMA
    per degree per output.  Fitting every table in ONE transformed
    coordinate w = T(u), u = r^2, at ONE shared degree lets the kernel run
    a single basis recurrence T_k(t) = 2t*T_{k-1} - T_{k-2} (1 FMA/degree)
    and accumulate each output as coefficient FMAs (1 FMA/degree/output) --
    ~40% fewer VPU ops at 3-4 outputs.

    The transform matters more: the physical tables decay exponentially in
    r, so in w = 1/u the Cu funcfl tables fit at degree 8-12 where u = r^2
    needs 16-20 (measured; the setfl Mishin tables carry spline-knot wiggle
    and prefer w = log u).  ``make_cheb_fused`` picks the cheapest
    (transform, degree) meeting tolerance for ALL tables.

    Derivatives come back as (1/r) df/dr = 2 * dP/dw * dw/du -- the exact
    gradient of the returned value (conservation by construction), with no
    sqrt or divide-by-r anywhere in the pair kernel.
    """

    transform: str     # "u" | "inv_u" | "log_u"
    u_lo: float
    u_hi: float
    w_lo: float
    w_hi: float
    deg: int
    coef: dict         # name -> np.ndarray [deg+1] (value, in w domain)
    dcoef: dict        # name -> np.ndarray [deg]   (dP/dw)
    # endpoint-constrained fits (see make_cheb_fused ``constraints``): maps
    # name -> exact value at the r2=0 clamp (u_lo); empty if unconstrained.
    # When every table is cutoff-exact, pair kernels can drop their masks:
    # beyond-cutoff pairs clamp to u_hi and contribute exactly zero, and
    # the constant self-pair (r2=0) term is subtracted per atom.
    self_val: dict = dataclasses.field(default_factory=dict)


_TRANSFORMS = {
    "u": (lambda u: u, 0.0),
    "inv_u": (lambda u: 1.0 / u, 1.0),       # dw/du = -w^2 (1 extra op)
    "log_u": (lambda u: np.log(u), 9.0),     # log + reciprocal for dw/du
}


def _cheb_vander(t, deg):
    """Chebyshev Vandermonde on t in [-1, 1]: [len(t), deg+1]."""
    t = np.atleast_1d(t)
    V = np.zeros((len(t), deg + 1))
    V[:, 0] = 1.0
    if deg >= 1:
        V[:, 1] = t
    for k in range(2, deg + 1):
        V[:, k] = 2.0 * t * V[:, k - 1] - V[:, k - 2]
    return V


def _cheb_dvander(t0, deg, half_span):
    """d T_k / dw at one point: [deg+1] row (T'_k(t) = k U_{k-1}(t))."""
    U = np.zeros(deg + 1)
    U[0] = 1.0
    if deg >= 1:
        U[1] = 2.0 * t0
    for k in range(2, deg + 1):
        U[k] = 2.0 * t0 * U[k - 1] - U[k - 2]
    d = np.zeros(deg + 1)
    for k in range(1, deg + 1):
        d[k] = k * U[k - 1]
    return d / half_span


def _fit_constrained(w, f, deg, w_lo, w_hi, w_end, mode):
    """Chebyshev LSQ with exact endpoint constraints at w_end.

    mode: '' (none), 'val' (P(w_end)=0), 'val_der' (also P'(w_end)=0).
    Constraint elimination via the SVD null space of the constraint rows.
    """
    mid, half = 0.5 * (w_lo + w_hi), 0.5 * (w_hi - w_lo)
    t = (w - mid) / half
    A = _cheb_vander(t, deg)
    if not mode:
        c, *_ = np.linalg.lstsq(A, f, rcond=None)
        return c
    t_end = (w_end - mid) / half
    rows = [_cheb_vander(np.array([t_end]), deg)[0]]
    if mode == "val_der":
        rows.append(_cheb_dvander(t_end, deg, half))
    C = np.stack(rows)
    _, _, Vt = np.linalg.svd(C)
    N = Vt[len(rows):].T
    z, *_ = np.linalg.lstsq(A @ N, f, rcond=None)
    return N @ z


def make_cheb_fused(tabs: dict, r_lo: float, r_hi: float,
                    tol_f: float = 2e-5, tol_df: float = 2e-3,
                    n_sample: int = 100001,
                    constraints: dict = None) -> ChebFused:
    """Fit all ``tabs`` (name -> InterpTable) with one shared basis.

    Candidate (transform, degree) pairs are tried in ascending VPU-cost
    order (cost ~ degree * (1 basis + n_out accs) + transform overhead);
    the first meeting (tol_f, tol_df) for every table wins.  Falls back to
    the most accurate candidate seen if none meets tolerance.

    ``constraints`` maps table name -> 'val' | 'val_der', enforcing EXACT
    zeros at the cutoff endpoint (value, optionally also the derivative):
    beyond-cutoff evaluations then contribute exactly nothing, which lets
    pair kernels run maskless (the r2=0 self-pair clamp constants are
    recorded in ``self_val`` for per-atom subtraction).
    """
    u_lo, u_hi = float(r_lo) ** 2, float(r_hi) ** 2
    u = np.linspace(u_lo, u_hi, n_sample)
    r = np.sqrt(u)
    refs = {name: _sample_reference(tab, r) for name, tab in tabs.items()}
    n_out = 2 * len(tabs)
    constraints = constraints or {}

    cands = []
    for tr, (fn, extra) in _TRANSFORMS.items():
        for deg in (8, 10, 12, 14, 16, 20, 24, 32):
            cands.append((deg * (1 + n_out) + extra, deg, tr))
    cands.sort()

    def dwdu_np(tr, w, u):
        if tr == "u":
            return np.ones_like(u)
        if tr == "inv_u":
            return -w * w
        return 1.0 / u  # log_u

    best = None        # (max_rel_excess, fused)
    for _cost, deg, tr in cands:
        fn, _ = _TRANSFORMS[tr]
        w = fn(u)
        dw = dwdu_np(tr, w, u)
        w_lo, w_hi = float(np.min(w)), float(np.max(w))
        w_end = float(fn(np.array([u_hi]))[0])
        coef, dcoef, self_val = {}, {}, {}
        worst = 0.0
        for name, (f_ref, df_ref) in refs.items():
            # per-table minimal degree within the shared (transform, deg):
            # the evaluator's accumulators stop at each table's own length,
            # so a smoother table (e.g. phi at deg 8 where rho needs 10)
            # costs fewer FMAs while still sharing the basis recurrence
            c, t_err = None, None
            for d in range(max(4, deg - 4), deg + 1, 2):
                cc = _fit_constrained(w, f_ref, d, w_lo, w_hi, w_end,
                                      constraints.get(name, ""))
                ch = np.polynomial.chebyshev.Chebyshev(
                    cc, domain=[w_lo, w_hi])
                err_f = np.max(np.abs(ch(w) - f_ref)) \
                    / np.max(np.abs(f_ref))
                err_df = np.max(
                    np.abs(ch.deriv()(w) * dw * 2.0 * r - df_ref)) \
                    / np.max(np.abs(df_ref))
                c, t_err = ch, max(err_f / tol_f, err_df / tol_df)
                if t_err <= 1.0:
                    break
            worst = max(worst, t_err)
            coef[name] = np.asarray(c.coef, np.float64)
            dcoef[name] = np.asarray(c.deriv().coef, np.float64)
            if constraints.get(name):
                self_val[name] = float(c(float(fn(np.array([u_lo]))[0])))
        fused = ChebFused(transform=tr, u_lo=u_lo, u_hi=u_hi,
                          w_lo=w_lo, w_hi=w_hi, deg=deg,
                          coef=coef, dcoef=dcoef, self_val=self_val)
        if worst <= 1.0:
            return fused
        if best is None or worst < best[0]:
            best = (worst, fused)
    import warnings
    warnings.warn(
        f"Chebyshev fit did not reach the requested tolerance for this "
        f"table (worst error {best[0]:.3g}x the tol_f/tol_df target); "
        f"returning the most accurate candidate.  Consider "
        f"interp_impl='twolevel' (reference-interpolant-exact) for this "
        f"potential file.", stacklevel=2)
    return best[1]


def eval_cheb_fused(fz: ChebFused, r2, wants):
    """Evaluate fused-basis outputs on u = r^2 arrays.

    ``wants`` is a sequence of (name, kind) with kind 'val' or 'der';
    returns the list of arrays in order.  'der' entries are
    (1/r) * df/dr = 2 * df/du (the form pair kernels multiply by the
    displacement vector -- no sqrt, no divide).

    One basis recurrence serves every requested output; coefficients are
    trace-time constants so XLA compiles this to pure VPU FMA chains with
    zero memory operands.
    """
    dtype = r2.dtype
    u = jnp.clip(r2, dtype.type(fz.u_lo), dtype.type(fz.u_hi))
    uinv = None
    if fz.transform == "u":
        w = u
    elif fz.transform == "inv_u":
        uinv = 1.0 / u
        w = uinv
    else:  # log_u
        uinv = 1.0 / u
        w = jnp.log(u)

    t = (w - dtype.type(0.5 * (fz.w_lo + fz.w_hi))) * dtype.type(
        2.0 / (fz.w_hi - fz.w_lo))
    t2 = t + t

    keys = list(wants)
    cs = [fz.coef[n] if k == "val" else fz.dcoef[n] for n, k in keys]
    deg = max(len(c) for c in cs) - 1

    # shared basis recurrence with inline accumulation
    accs = [jnp.full_like(u, dtype.type(c[0])) for c in cs]
    if deg >= 1:
        accs = [a + dtype.type(c[1]) * t if len(c) > 1 else a
                for a, c in zip(accs, cs)]
    Tm1, Tk = jnp.ones_like(u), t
    for k in range(2, deg + 1):
        Tm1, Tk = Tk, t2 * Tk - Tm1
        accs = [a + dtype.type(c[k]) * Tk if len(c) > k else a
                for a, c in zip(accs, cs)]

    if fz.transform == "u":
        two_dwdu = dtype.type(2.0)
    elif fz.transform == "inv_u":
        two_dwdu = dtype.type(-2.0) * w * w
    else:
        two_dwdu = dtype.type(2.0) * uinv

    outs = []
    for (n, kind), a in zip(keys, accs):
        outs.append(a if kind == "val" else two_dwdu * a)
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
