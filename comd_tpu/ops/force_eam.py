"""EAM three-pass force with mid-force dfEmbed halo exchange (XLA path).

Algorithm per the reference (src-mpi/eam.c:44-86, oracle eamForceCpuNL
eam.c:266-419):

  pass 1 (pairs): U_i += 0.5*phi(r_ij); rhobar_i += rho(r_ij);
                  f_i -= phi'(r_ij) * rhat
  pass 2 (atoms): U_i += F(rhobar_i); dfEmbed_i = F'(rhobar_i)
  -- halo exchange of dfEmbed (the reference's raison d'etre:
     haloExchange(forceExchange), eam.c:241/370) --
  pass 3 (pairs): f_i -= (dfEmbed_i + dfEmbed_j) * rho'(r_ij) * rhat

The halo fill is injected by the caller: a static periodic gather in serial
(ops/binning.fill_halo_scalar_serial) or a mesh ppermute in the sharded step
(parallel/exchange.py).  Tables evaluate as quadratic interpolation
(eam.c:557-579) or cubic splines in r^2 (-P flag, gpu_common.h:95-129).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..cells import CellGeometry
from ..potentials.eam import EamPotential
from ..potentials import tables
from .sweep import cell_pair_sweep


def _interp(table_dev, tab, rr):
    return tables.interpolate(table_dev, tab.n, tab.x0, tab.inv_dx, rr)


def eam_force(
    geom: CellGeometry,
    pot: EamPotential,
    r,                       # [3, B, A] with halo cells filled
    fill_halo_scalar: Callable,  # ([B, A] field) -> field with halo filled
    *,
    spline: bool = False,
    chunk: int = 256,
    e_dtype=jnp.float64,
):
    """Returns (force [3, n_local, A], U [n_local, A], ePot, dfEmbed [B, A])."""
    dtype = r.dtype
    B, A = r.shape[1], r.shape[2]
    rcut2 = pot.cutoff * pot.cutoff

    phi_dev = pot.phi.values_device(dtype)
    rho_dev = pot.rho.values_device(dtype)
    f_dev = pot.f.values_device(dtype)

    if spline:
        # n and values exactly as the reference call site
        # (gpu_utility.c:498-500): values[] is the padded table, so
        # values[n+1] == values[n-1] is readable.
        phi_sp = tables.make_spline(pot.phi.padded[1:], pot.phi.n,
                                    pot.phi.x0, pot.phi.inv_dx)
        rho_sp = tables.make_spline(pot.rho.padded[1:], pot.rho.n,
                                    pot.rho.x0, pot.rho.inv_dx)
        phi_c = jnp.asarray(phi_sp.coeffs, dtype=dtype)
        rho_c = jnp.asarray(rho_sp.coeffs, dtype=dtype)

        def eval_phi(r2, rr):
            # spline returns (f, (1/r) df/dr); convert to df/dr = df*r
            f, df = tables.interpolate_spline(
                phi_c, phi_sp.n, phi_sp.x0, phi_sp.xn, phi_sp.inv_dx, r2)
            return f, df * rr

        def eval_rho(r2, rr):
            f, df = tables.interpolate_spline(
                rho_c, rho_sp.n, rho_sp.x0, rho_sp.xn, rho_sp.inv_dx, r2)
            return f, df * rr
    else:
        def eval_phi(r2, rr):
            return _interp(phi_dev, pot.phi, rr)

        def eval_rho(r2, rr):
            return _interp(rho_dev, pot.rho, rr)

    # ---- pass 1: pair energy, density accumulation, pair force ----
    def pair1(r2, mask, sj, si):
        rr = jnp.sqrt(jnp.where(mask, r2, 1.0))
        phi, dphi = eval_phi(r2, rr)
        rho, _ = eval_rho(r2, rr)
        phi = jnp.where(mask, phi, 0.0)
        rho = jnp.where(mask, rho, 0.0)
        fcoef = jnp.where(mask, -dphi / rr, 0.0)  # f_i -= dPhi * dr/r
        return fcoef, [phi, rho]

    f1, (phi_sum, rhobar_l) = cell_pair_sweep(geom, r, pair1, rcut2, chunk=chunk)

    # ---- pass 2: embedding term (eam.c:351-366) ----
    f_emb, df_emb_l = _interp(f_dev, pot.f, rhobar_l)
    # zero out empty slots: rhobar==0 there, but F(0) may be nonzero;
    # mask by "participated in any pair OR occupies a slot" -- an atom with
    # zero neighbors still gets F(0), matching the reference loop over real
    # atoms.  Empty slots have phi_sum==rhobar==0 AND sentinel coords; use
    # gid-independent occupancy mask supplied via rhobar trick is unsafe, so
    # the caller masks U/dfEmbed by slot validity. Here we compute raw values.

    u = 0.5 * phi_sum.astype(e_dtype) + f_emb.astype(e_dtype)

    df_embed = jnp.zeros((B, A), dtype=dtype)
    df_embed = df_embed.at[:geom.n_local].set(df_emb_l.astype(dtype))

    # ---- halo exchange of dfEmbed (eam.c:241, 368-371) ----
    df_embed = fill_halo_scalar(df_embed)

    # ---- pass 3: embedding force (eam.c:374-413) ----
    def pair3(r2, mask, sj, si):
        rr = jnp.sqrt(jnp.where(mask, r2, 1.0))
        _, drho = eval_rho(r2, rr)
        dfe_j = sj[0]
        dfe_i = si[0]
        fcoef = jnp.where(mask, -(dfe_i + dfe_j) * drho / rr, 0.0)
        return fcoef, []

    f3, _ = cell_pair_sweep(geom, r, pair3, rcut2, chunk=chunk,
                            scalar_j=[df_embed])
    return f1 + f3, u, df_embed


def finalize_eam_energy(u, valid_mask, e_dtype=jnp.float64):
    """Mask embedding energy of empty slots and reduce.

    pass 2 assigns F(rhobar=0) != 0 to every slot; only slots holding real
    atoms contribute (reference loops over nAtoms per box, eam.c:353-366).
    """
    u = jnp.where(valid_mask, u, 0.0)
    return u, jnp.sum(u.astype(e_dtype))
