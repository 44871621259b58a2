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
from .sweep import cell_pair_sweep, sweep_dispatch


def make_lj_pair_fn(pot: LjPotential, dtype, want_energy: bool = True):
    """Per-pair LJ physics shared by the cell-sweep and NL paths.

    ``want_energy=False`` skips the pair-energy terms (reporting only, not
    dynamics) -- scalars come back empty.
    """
    s6 = dtype.type(pot.s6)
    eps = dtype.type(pot.epsilon)
    e_shift = dtype.type(pot.e_shift)

    def pair_fn(r2, mask, sj, si):
        inv_r2 = jnp.where(mask, 1.0 / jnp.where(mask, r2, 1.0), 0.0)
        r6 = (s6 * inv_r2) * (inv_r2 * inv_r2)
        # f_i += fcoef * (r_i - r_j); reference: ifx -= drx*fr with
        # fr = -4*eps*r6*inv_r2*(12*r6 - 6)   (ljForce.c:229-233)
        fcoef = 4.0 * eps * r6 * inv_r2 * (12.0 * r6 - 6.0)
        fcoef = jnp.where(mask, fcoef, 0.0)
        if not want_energy:
            return fcoef, []
        e = jnp.where(mask, r6 * (r6 - 1.0) - e_shift, 0.0)
        return fcoef, [e]

    return pair_fn


def lj_force(geom: CellGeometry, pot: LjPotential, r, *, chunk=256,
             e_dtype=jnp.float64, want_energy: bool = True,
             sweep_impl: str = "gather"):
    """Compute (force [3, n_local, A], U [n_local, A], ePot scalar)."""
    rcut2 = pot.cutoff * pot.cutoff
    pair_fn = make_lj_pair_fn(pot, r.dtype, want_energy)
    sweep = sweep_dispatch(sweep_impl)
    force, scal = sweep(geom, r, pair_fn, rcut2, chunk=chunk)
    if not want_energy:
        return force, None, None
    # each pair counted twice in the full sweep -> x0.5, then the global
    # 4*epsilon scaling (ljForce.c:256-261)
    u = (0.5 * 4.0 * pot.epsilon) * scal[0].astype(e_dtype)
    e_pot = jnp.sum(u)
    return force, u.astype(r.dtype), e_pot


def lj_force_half(geom: CellGeometry, pot: LjPotential, r, fold, *,
                  chunk=512, e_dtype=jnp.float64, want_energy: bool = True,
                  fetch: str = "slices", materialize: bool = False):
    """LJ via the Newton's-3rd-law half sweep (each pair evaluated once,
    j-side delivered by overlap-add; see sweep.cell_pair_sweep_half).

    ``fold`` maps dense [..., n_total, A] contributions to [..., n_local, A]
    (sweep.fold_halo_serial, or exchange.fold_halo over a mesh).
    Returns (force [3, n_local, A], U [n_local, A], ePot)."""
    from .sweep import cell_pair_sweep_half
    rcut2 = pot.cutoff * pot.cutoff
    pair_fn = make_lj_pair_fn(pot, r.dtype, want_energy)
    force, scal = cell_pair_sweep_half(geom, r, pair_fn, rcut2, chunk=chunk,
                                       fetch=fetch, materialize=materialize)
    force = fold(force)
    if not want_energy:
        return force, None, None
    u = fold(scal[0])
    # the half sweep delivers e to both sides of each pair, so the atom sum
    # double-counts pairs exactly as the full sweep does -> same 0.5 * 4eps
    u = (0.5 * 4.0 * pot.epsilon) * u.astype(e_dtype)
    e_pot = jnp.sum(u)
    return force, u.astype(r.dtype), e_pot


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


def lj_force_split(geom: CellGeometry, pot: LjPotential, r, interior,
                   boundary, *, r_pre=None, chunk=256, e_dtype=jnp.float64,
                   want_energy: bool = True):
    """LJ with the interior/boundary split: interior cells sweep
    pre-exchange positions so XLA can overlap the atom exchange with
    interior force compute (-a capability; see force_eam.eam_force_split).

    ``want_energy=False`` keeps the energy-lazy block structure on -a 1
    steps (parity with eam_force_split): no pair-energy chain on
    non-reporting steps."""
    from .force_eam import _scatter_lists
    rcut2 = pot.cutoff * pot.cutoff
    pair_fn = make_lj_pair_fn(pot, r.dtype, want_energy)
    r_pre = r if r_pre is None else r_pre
    f_i, scal_i = cell_pair_sweep(geom, r_pre, pair_fn, rcut2, chunk=chunk,
                                  boxes=interior)
    f_b, scal_b = cell_pair_sweep(geom, r, pair_fn, rcut2, chunk=chunk,
                                  boxes=boundary)
    force = _scatter_lists(geom.n_local, interior, boundary, f_i, f_b)
    if not want_energy:
        return force, None, None
    scale = 0.5 * 4.0 * pot.epsilon
    u = _scatter_lists(geom.n_local, interior, boundary,
                       scale * scal_i[0].astype(e_dtype),
                       scale * scal_b[0].astype(e_dtype))
    return force, u.astype(r.dtype), jnp.sum(u)


def lj_force_nl_split(nlist, pot: LjPotential, r, n_rows_interior: int, *,
                      r_pre=None, chunk=2048, e_dtype=jnp.float64,
                      want_energy: bool = True):
    """LJ NL force with the interior/boundary row split (-a 1 on the NL
    methods): interior rows sweep pre-exchange positions so XLA can overlap
    the ghost-position refresh with interior compute.  Requires a
    NeighborList built with row_split (see force_eam.eam_force_nl_split).

    Returns (force [3, B, A], U | None, ePot | None)."""
    from . import neighborlist as nlmod
    B, A = r.shape[1], r.shape[2]
    rcut2 = pot.cutoff * pot.cutoff
    pair_fn = make_lj_pair_fn(pot, r.dtype, want_energy)
    r_pre = r if r_pre is None else r_pre
    n_rows = nlist.a_list.shape[0]
    nl_i = nlmod.slice_rows(nlist, 0, n_rows_interior)
    nl_b = nlmod.slice_rows(nlist, n_rows_interior, n_rows)
    f_i, scal_i = nlmod.pair_sweep_nl(nl_i, r_pre, pair_fn, rcut2,
                                      chunk=chunk)
    f_b, scal_b = nlmod.pair_sweep_nl(nl_b, r, pair_fn, rcut2, chunk=chunk)
    force = nlmod.scatter_rows(nlist, jnp.concatenate([f_i, f_b], axis=1),
                               B, A)
    if not want_energy:
        return force, None, None
    u_rows = (0.5 * 4.0 * pot.epsilon) * jnp.concatenate(
        [scal_i[0], scal_b[0]]).astype(e_dtype)
    u_rows = jnp.where(nlist.a_valid, u_rows, 0.0)
    e_pot = jnp.sum(u_rows)
    u = nlmod.scatter_rows(nlist, u_rows.astype(r.dtype), B, A)
    return force, u, e_pot


def lj_force_nl(nlist, pot: LjPotential, r, *, chunk=2048,
                e_dtype=jnp.float64, want_energy: bool = True):
    """LJ via Verlet neighbor list (thread_atom_nl / -L pairlist analog).

    Returns (force [3, B, A], U [B, A], ePot).  Reference NL force:
    ljForceCpuNL (ljForce.c:146-265) / the *_nl GPU kernels.
    """
    from . import neighborlist as nlmod
    B, A = r.shape[1], r.shape[2]
    rcut2 = pot.cutoff * pot.cutoff
    pair_fn = make_lj_pair_fn(pot, r.dtype, want_energy)
    f_rows, scal = nlmod.pair_sweep_nl(
        nlist, r, pair_fn, rcut2, chunk=chunk)
    force = nlmod.scatter_rows(nlist, f_rows, B, A)
    if not want_energy:
        return force, None, None
    u_rows = (0.5 * 4.0 * pot.epsilon) * scal[0].astype(e_dtype)
    u_rows = jnp.where(nlist.a_valid, u_rows, 0.0)
    e_pot = jnp.sum(u_rows)
    u = nlmod.scatter_rows(nlist, u_rows.astype(r.dtype), B, A)
    return force, u, e_pot
