"""Lennard-Jones force/energy over link cells (XLA path).

Physics identical to the reference CPU oracle (ljForceCpuNL,
src-mpi/ljForce.c:146-265) and GPU kernels (gpu_lj_thread_atom.h:31-143):

  e_pair = r6*(r6-1) - eShift          (unscaled; x 4*epsilon at the end)
  f_i   += 4*eps*r6*invr2*(12*r6-6) * (r_i - r_j)

The reference walks a half neighbor list and scatters to both atoms; we sweep
the full 27-cell neighborhood from each atom's side (every pair visited twice,
energy halved), which is branch-free and scatter-free -- the right shape for
the VPU.  Optionally evaluates via the interpolation table (-I flag,
initLJinterpolation, src-mpi/gpu_utility.c:348-374).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..cells import CellGeometry
from ..potentials.lj import LjPotential
from ..potentials import tables
from .sweep import cell_pair_sweep


def lj_force(geom: CellGeometry, pot: LjPotential, r, *, chunk=256,
             e_dtype=jnp.float64):
    """Compute (force [3, n_local, A], U [n_local, A], ePot scalar)."""
    dtype = r.dtype
    s6 = dtype.type(pot.s6)
    eps = dtype.type(pot.epsilon)
    e_shift = dtype.type(pot.e_shift)
    rcut2 = pot.cutoff * pot.cutoff

    def pair_fn(r2, mask, sj, si):
        inv_r2 = jnp.where(mask, 1.0 / jnp.where(mask, r2, 1.0), 0.0)
        r6 = (s6 * inv_r2) * (inv_r2 * inv_r2)
        e = jnp.where(mask, r6 * (r6 - 1.0) - e_shift, 0.0)
        # f_i += fcoef * (r_i - r_j); reference: ifx -= drx*fr with
        # fr = -4*eps*r6*inv_r2*(12*r6 - 6)   (ljForce.c:229-233)
        fcoef = 4.0 * eps * r6 * inv_r2 * (12.0 * r6 - 6.0)
        fcoef = jnp.where(mask, fcoef, 0.0)
        return fcoef, [e]

    force, (u,) = cell_pair_sweep(geom, r, pair_fn, rcut2, chunk=chunk)
    # each pair counted twice in the full sweep -> x0.5, then the global
    # 4*epsilon scaling (ljForce.c:256-261)
    u = (0.5 * 4.0 * pot.epsilon) * u.astype(e_dtype)
    e_pot = jnp.sum(u)
    return force, u.astype(dtype), e_pot


def lj_force_interp(geom: CellGeometry, pot: LjPotential, r, *, chunk=256,
                    e_dtype=jnp.float64):
    """Table-interpolated LJ (-I): energies from the 1000-point quadratic
    table of U_LJ(r) built exactly as initLJinterpolation
    (gpu_utility.c:348-374); forces from the table derivative."""
    dtype = r.dtype
    x0 = 0.5 * pot.sigma
    n = 1000
    inv_dx = n / (pot.cutoff - x0)
    import numpy as np
    i = np.arange(n + 3)
    x = x0 + (i - 1) / inv_dx
    r2x = 1.0 / (x * x)
    r6x = pot.s6 * r2x ** 3
    vals = 4.0 * pot.epsilon * (r6x * (r6x - 1.0) - pot.e_shift)
    padded = jnp.asarray(vals, dtype=dtype)
    rcut2 = pot.cutoff * pot.cutoff

    def pair_fn(r2, mask, sj, si):
        rr = jnp.sqrt(jnp.where(mask, r2, 1.0))
        e, de = tables.interpolate(padded, n, x0, inv_dx, rr)
        e = jnp.where(mask, e, 0.0)
        # f_i = -dU/dr * rhat = -(de/rr) * dr
        fcoef = jnp.where(mask, -de / rr, 0.0)
        return fcoef, [e]

    force, (u,) = cell_pair_sweep(geom, r, pair_fn, rcut2, chunk=chunk)
    u = 0.5 * u.astype(e_dtype)  # table already carries the 4*eps factor
    e_pot = jnp.sum(u)
    return force, u.astype(dtype), e_pot
