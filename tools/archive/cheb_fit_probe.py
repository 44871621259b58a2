"""Probe: Chebyshev-in-r^2 approximation quality of the EAM table
interpolants (phi, rho) for both shipped potentials.

Question: what degree + r_lo gives f32-class accuracy (rel err ~1e-6) for a
single-interval Chebyshev fit in u = r^2, evaluated in f32?  If feasible,
per-pair table lookups become pure FMA chains (no gathers/one-hot) in both
the XLA sweep and a Pallas kernel.
"""
import numpy as np
import sys

sys.path.insert(0, ".")
from comd_tpu.potentials.eam import init_eam_pot
from comd_tpu.potentials import tables


def ref_eval(tab, r):
    """Reference quadratic interpolation (f64, numpy port of interpolate4)."""
    r = np.maximum(r, tab.x0)
    rr = (r - tab.x0) * tab.inv_dx
    ii = np.floor(rr).astype(np.int64)
    over = ii > tab.n
    ii = np.minimum(ii, tab.n)
    frac = np.where(over, 0.0, rr - np.floor(rr))
    pad4 = np.concatenate([tab.padded, tab.padded[-1:]])
    tm1, t0, t1, t2 = (pad4[ii + k] for k in range(4))
    g1 = t1 - tm1
    g2 = t2 - t0
    f = t0 + 0.5 * frac * (g1 + frac * (t1 + tm1 - 2.0 * t0))
    df = 0.5 * (g1 + frac * (g2 - g1)) * tab.inv_dx
    return f, df


def fit_and_score(tab, r_lo, r_hi, deg, n_sample=200001):
    u_lo, u_hi = r_lo**2, r_hi**2
    u = np.linspace(u_lo, u_hi, n_sample)
    r = np.sqrt(u)
    f_ref, df_ref = ref_eval(tab, r)

    cheb = np.polynomial.chebyshev.Chebyshev.fit(u, f_ref, deg,
                                                 domain=[u_lo, u_hi])
    dcheb = cheb.deriv()

    # f32 evaluation via Clenshaw on f32 coefficients
    def eval_f32(c, dom, x):
        x32 = x.astype(np.float32)
        t = ((2 * x32 - (dom[0] + dom[1])) / (dom[1] - dom[0])).astype(
            np.float32) * np.float32(2.0)  # 2*t for Clenshaw
        coef = c.coef.astype(np.float32)
        b0 = np.zeros_like(x32)
        b1 = np.zeros_like(x32)
        for k in range(len(coef) - 1, 0, -1):
            b0, b1 = t * b0 - b1 + coef[k], b0
        return (t / np.float32(2.0)) * b0 - b1 + coef[0]

    f_fit = eval_f32(cheb, cheb.domain, u)
    dfu_fit = eval_f32(dcheb, cheb.domain, u)   # dP/du
    df_fit = 2.0 * r * dfu_fit                  # df/dr = 2 r dP/du

    scale_f = np.max(np.abs(f_ref))
    scale_df = np.max(np.abs(df_ref))
    err_f = np.max(np.abs(f_fit - f_ref)) / scale_f
    err_df = np.max(np.abs(df_fit - df_ref)) / scale_df
    return err_f, err_df


for pot_name, pot_type in [("Cu_u6.eam", "funcfl"),
                           ("Cu01.eam.alloy", "setfl")]:
    pot = init_eam_pot("pots", pot_name, pot_type)
    print(f"\n=== {pot_name} cutoff={pot.cutoff:.4f} "
          f"phi.n={pot.phi.n} rho.n={pot.rho.n} f.n={pot.f.n}")
    for r_lo in (1.5, 1.8, 2.0):
        for deg in (8, 12, 16, 20, 24, 32):
            ep, edp = fit_and_score(pot.phi, r_lo, pot.cutoff, deg)
            er, edr = fit_and_score(pot.rho, r_lo, pot.cutoff, deg)
            print(f"r_lo={r_lo:.1f} deg={deg:2d}  "
                  f"phi: f={ep:.2e} df={edp:.2e}   "
                  f"rho: f={er:.2e} df={edr:.2e}")
