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
from .sweep import cell_pair_sweep, sweep_dispatch


def _interp(table_dev, tab, rr):
    """Quadratic interpolation via the row-stencil matrix (one gather/eval)."""
    return tables.interpolate4(table_dev, tab.n, tab.x0, tab.inv_dx, rr)


def make_evaluators(pot: EamPotential, dtype, spline: bool,
                    impl: str = "rows"):
    """(eval_phi, eval_rho) shared by the cell-sweep and NL paths.

    impl='rows' uses exact row-stencil gathers (slow on TPU, exact anywhere);
    impl='twolevel' uses the gather-free one-hot-matmul lookup (~40x faster
    on TPU, <=1 ulp difference; see tables.interpolate_twolevel).
    """
    if impl == "cheb" and not spline:
        # gather-free FMA-chain lookup (tables.ChebFused); coefficients are
        # trace-time constants, so the evaluators compile into pure VPU
        # arithmetic with zero memory operands -- the fastest TPU path.
        # One shared basis recurrence (in the fit's transformed coordinate)
        # feeds phi, phi', rho, rho' as coefficient FMAs.
        # u_form: the derivative comes back as (1/r) df/dr (native to the
        # r^2-domain fit), so the pair kernels need NO sqrt and NO divide.
        fz = pot.cheb_pair

        def pair1_eval(r2, want_energy):
            """(phi|None, dphi, rho) -- the exact pass-1 output set."""
            wants = ([("phi", "val")] if want_energy else []) + \
                [("phi", "der"), ("rho", "val")]
            outs = tables.eval_cheb_fused(fz, r2, wants)
            if want_energy:
                return outs[0], outs[1], outs[2]
            return None, outs[0], outs[1]

        def pair3_eval(r2):
            (drho,) = tables.eval_cheb_fused(fz, r2, [("rho", "der")])
            return drho

        def eval_phi(r2, rr):
            return tuple(tables.eval_cheb_fused(
                fz, r2, [("phi", "val"), ("phi", "der")]))

        def eval_rho(r2, rr):
            return tuple(tables.eval_cheb_fused(
                fz, r2, [("rho", "val"), ("rho", "der")]))

        eval_phi.u_form = True
        eval_rho.u_form = True
        eval_phi.pair1_eval = pair1_eval
        eval_rho.pair3_eval = pair3_eval
        return eval_phi, eval_rho

    if impl == "twolevel" and not spline:
        T2np, nb = tables.pack_twolevel([pot.phi, pot.rho], block_rows=8)
        T2 = jnp.asarray(T2np, dtype=dtype)
        tab = pot.phi

        # batch=4096 measured fastest for f32 pair-tensor lookup counts;
        # f64 pays ~20us of serial dispatch per map body (226M lookups =
        # 55k bodies at 4096), so it batches coarser -- but not so coarse
        # that the [batch, nb] one-hot block overruns VMEM (65536 rows
        # produced FAILED_PRECONDITION on v5e)
        batch = 4096 if jnp.dtype(dtype) == jnp.float32 else 16384

        def eval_both(rr):
            (phi, dphi), (rho, drho) = tables.interpolate_twolevel(
                T2, nb, 8, 2, tab.n, tab.x0, tab.inv_dx, rr, batch=batch)
            return phi, dphi, rho, drho

        def eval_phi(r2, rr):
            phi, dphi, _, _ = eval_both(rr)
            return phi, dphi

        def eval_rho(r2, rr):
            _, _, rho, drho = eval_both(rr)
            return rho, drho

        # make_pair1 uses the fused fetch directly (one matmul for both
        # tables) instead of relying on CSE across the two wrappers
        eval_phi.fused = eval_both
        return eval_phi, eval_rho

    phi_dev = pot.phi.stencil_device(dtype)
    rho_dev = pot.rho.stencil_device(dtype)

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

        # spline evaluates in r^2 and returns (f, (1/r) df/dr) natively --
        # u_form spares the pair kernels the sqrt/divide round trip
        def eval_phi(r2, rr):
            return tables.interpolate_spline(
                phi_c, phi_sp.n, phi_sp.x0, phi_sp.xn, phi_sp.inv_dx, r2)

        def eval_rho(r2, rr):
            return tables.interpolate_spline(
                rho_c, rho_sp.n, rho_sp.x0, rho_sp.xn, rho_sp.inv_dx, r2)

        eval_phi.u_form = True
        eval_rho.u_form = True
    else:
        def eval_phi(r2, rr):
            return _interp(phi_dev, pot.phi, rr)

        def eval_rho(r2, rr):
            return _interp(rho_dev, pot.rho, rr)

    return eval_phi, eval_rho



def make_f_eval(pot: EamPotential, dtype, impl: str):
    """Pass-2 embedding-function evaluator F(rhobar) -> (F, dF).

    Per-atom (27x fewer evaluations than the pair passes) but still ~1.5M
    gathers at 1M atoms on the 'rows' path (~7 ms on v5e); the fast impls
    use the exact two-level one-hot lookup instead (<=1 ulp).  F is not
    Chebyshev-fit: rhobar's domain edge (rho -> 0) has sqrt-like curvature
    the global fit handles poorly, and pass 2 is cheap enough exactly.
    """
    if impl in ("twolevel", "cheb"):
        T2np, nb = tables.pack_twolevel([pot.f], block_rows=8)
        T2 = jnp.asarray(T2np, dtype=dtype)
        tab = pot.f

        def eval_f(rho):
            (f, df), = tables.interpolate_twolevel(
                T2, nb, 8, 1, tab.n, tab.x0, tab.inv_dx, rho)
            return f, df

        return eval_f
    f_dev = pot.f.stencil_device(dtype)
    return lambda rho: _interp(f_dev, pot.f, rho)


def make_pair1(eval_phi, eval_rho, want_energy: bool = True):
    """Pass-1 per-pair physics: phi energy, rho accumulation, pair force.

    ``u_form`` evaluators (cheb, spline) return (1/r) df/dr directly, so
    the pair kernel needs neither a sqrt nor a divide.  With
    ``want_energy=False`` the phi-value chain (needed only for reporting,
    not for dynamics) is skipped entirely -- scalars are then just [rho].
    """
    fused = getattr(eval_phi, "fused", None)
    p1e = getattr(eval_phi, "pair1_eval", None)
    u_form = getattr(eval_phi, "u_form", False)

    def pair1(r2, mask, sj, si):
        if p1e is not None:
            rr = None
            phi, dphi, rho = p1e(r2, want_energy)
        else:
            rr = None if u_form else jnp.sqrt(jnp.where(mask, r2, 1.0))
            if fused is not None:
                phi, dphi, rho, _ = fused(rr)
            else:
                phi, dphi = eval_phi(r2, rr)
                rho, _ = eval_rho(r2, rr)
        rho = jnp.where(mask, rho, 0.0)
        # f_i -= dPhi * dr/r
        fcoef = jnp.where(mask, -dphi if u_form else -dphi / rr, 0.0)
        scalars = [rho]
        if want_energy:
            scalars.insert(0, jnp.where(mask, phi, 0.0))
        return fcoef, scalars

    return pair1


def make_pair3(eval_rho):
    """Pass-3 per-pair physics: embedding force term."""
    u_form = getattr(eval_rho, "u_form", False)
    p3e = getattr(eval_rho, "pair3_eval", None)

    def pair3(r2, mask, sj, si):
        if p3e is not None:
            scale = p3e(r2)
        else:
            rr = None if u_form else jnp.sqrt(jnp.where(mask, r2, 1.0))
            _, drho = eval_rho(r2, rr)
            scale = drho if u_form else drho / rr
        fcoef = jnp.where(mask, -(si[0] + sj[0]) * scale, 0.0)
        return fcoef, []

    return pair3


def eam_force(
    geom: CellGeometry,
    pot: EamPotential,
    r,                       # [3, B, A] with halo cells filled
    fill_halo_scalar: Callable,  # ([B, A] field) -> field with halo filled
    *,
    spline: bool = False,
    chunk: int = 256,
    e_dtype=jnp.float64,
    interp_impl: str = "rows",
    want_energy: bool = True,
    sweep_impl: str = "gather",
):
    """Returns (force [3, n_local, A], U_raw [n_local, A], dfEmbed [B, A]).

    ``want_energy=False`` (dynamics-only steps between reporting
    boundaries) skips the phi-value work and returns U_raw=None.
    """
    dtype = r.dtype
    B, A = r.shape[1], r.shape[2]
    rcut2 = pot.cutoff * pot.cutoff
    eval_phi, eval_rho = make_evaluators(pot, dtype, spline, interp_impl)
    eval_f = make_f_eval(pot, dtype, interp_impl)
    sweep = sweep_dispatch(sweep_impl)

    # ---- pass 1: pair energy, density accumulation, pair force ----
    pair1 = make_pair1(eval_phi, eval_rho, want_energy)
    f1, scal = sweep(geom, r, pair1, rcut2, chunk=chunk)
    phi_sum, rhobar_l = scal if want_energy else (None, scal[0])

    # ---- pass 2: embedding term (eam.c:351-366) ----
    f_emb, df_emb_l = eval_f(rhobar_l)
    # zero out empty slots: rhobar==0 there, but F(0) may be nonzero;
    # mask by "participated in any pair OR occupies a slot" -- an atom with
    # zero neighbors still gets F(0), matching the reference loop over real
    # atoms.  Empty slots have phi_sum==rhobar==0 AND sentinel coords; use
    # gid-independent occupancy mask supplied via rhobar trick is unsafe, so
    # the caller masks U/dfEmbed by slot validity. Here we compute raw values.

    u = (0.5 * phi_sum.astype(e_dtype) + f_emb.astype(e_dtype)
         if want_energy else None)

    df_embed = jnp.zeros((B, A), dtype=dtype)
    df_embed = df_embed.at[:geom.n_local].set(df_emb_l.astype(dtype))

    # ---- halo exchange of dfEmbed (eam.c:241, 368-371) ----
    df_embed = fill_halo_scalar(
        df_embed, rhobar_l=rhobar_l.astype(dtype))

    # ---- pass 3: embedding force (eam.c:374-413) ----
    pair3 = make_pair3(eval_rho)
    f3, _ = sweep(geom, r, pair3, rcut2, chunk=chunk,
                  scalar_j=[df_embed])
    return f1 + f3, u, df_embed


def eam_force_half(
    geom: CellGeometry,
    pot: EamPotential,
    r,                       # [3, B, A] with halo cells filled
    fill_halo_scalar: Callable,
    fold: Callable,          # [..., n_total, A] -> [..., n_local, A]
    *,
    spline: bool = False,
    chunk: int = 512,
    e_dtype=jnp.float64,
    interp_impl: str = "rows",
    want_energy: bool = True,
    fetch: str = "slices",
    materialize: bool = False,
):
    """Three-pass EAM with Newton's-3rd-law half sweeps for passes 1 and 3.

    Each pair is evaluated once (the reference's half-list kernels,
    eam.c:266-419); the j-side lands on dense rows -- halo rows fold back
    to owners via ``fold`` (the half-shell force exchange).  phi and rho
    are symmetric, so the j-side scalar delivery equals the i-side one.

    Returns (force [3, n_local, A], U_raw [n_local, A], dfEmbed [B, A]).
    """
    from .sweep import cell_pair_sweep_half
    dtype = r.dtype
    B, A = r.shape[1], r.shape[2]
    rcut2 = pot.cutoff * pot.cutoff
    eval_phi, eval_rho = make_evaluators(pot, dtype, spline, interp_impl)
    eval_f = make_f_eval(pot, dtype, interp_impl)

    f1d, scal_d = cell_pair_sweep_half(
        geom, r, make_pair1(eval_phi, eval_rho, want_energy), rcut2,
        chunk=chunk, fetch=fetch, materialize=materialize)
    phi_d, rho_d = scal_d if want_energy else (None, scal_d[0])
    rhobar_l = fold(rho_d)

    f_emb, df_emb_l = eval_f(rhobar_l)
    u = (0.5 * fold(phi_d).astype(e_dtype) + f_emb.astype(e_dtype)
         if want_energy else None)

    df_embed = jnp.zeros((B, A), dtype=dtype)
    df_embed = df_embed.at[:geom.n_local].set(df_emb_l.astype(dtype))
    df_embed = fill_halo_scalar(
        df_embed, rhobar_l=rhobar_l.astype(dtype))

    f3d, _ = cell_pair_sweep_half(
        geom, r, make_pair3(eval_rho), rcut2, chunk=chunk,
        scalar_j=[df_embed], fetch=fetch, materialize=materialize)
    # fold is linear: one halo force exchange on the summed dense passes
    return fold(f1d + f3d), u, df_embed


def eam_force_pallas(
    geom: CellGeometry,
    pot: EamPotential,
    r,                       # [3, B, A] with halo cells filled
    fill_halo_scalar: Callable,
    *,
    chunk: int = 512,
    e_dtype=jnp.float64,
    interpret: bool = False,
    want_energy: bool = True,
    half: bool = False,
    fold: Callable = None,
):
    """Three-pass EAM force with the pair passes as Pallas stencil kernels
    (the gpu_eam_cta_cell.h analog; table lookups are the in-kernel
    shared-basis Chebyshev evaluator).  Pass 2 (per-atom embedding) stays
    in XLA.  ``half=True`` uses the pair-once half-shell kernel (dual
    delivery from one VMEM pair block); ``fold`` then folds halo-row
    contributions back to owners (the half-shell force exchange).

    Returns (force [3, n_local, A], U_raw [n_local, A], dfEmbed [B, A]).
    """
    from .pallas.stencil import eam_pass1_stencil, eam_pass3_stencil
    if half and fold is None:
        raise ValueError(
            "eam_force_pallas(half=True) requires a fold callable to "
            "deliver halo-row contributions back to owner cells")
    dtype = r.dtype
    B, A = r.shape[1], r.shape[2]
    eval_f = make_f_eval(pot, dtype, "twolevel")

    f1, phi_sum, rhobar_l = eam_pass1_stencil(
        geom, pot, r, chunk=chunk, interpret=interpret,
        want_energy=want_energy, half=half)
    if half:
        rhobar_l = fold(rhobar_l)
        if want_energy:
            phi_sum = fold(phi_sum)

    # pass 2 (eam.c:351-366) -- per-atom, 27x fewer lookups than the pair
    # passes; exact two-level lookup
    f_emb, df_emb_l = eval_f(rhobar_l.astype(dtype))
    u = (0.5 * phi_sum.astype(e_dtype) + f_emb.astype(e_dtype)
         if want_energy else None)

    df_embed = jnp.zeros((B, A), dtype=dtype)
    df_embed = df_embed.at[:geom.n_local].set(df_emb_l.astype(dtype))
    df_embed = fill_halo_scalar(
        df_embed, rhobar_l=rhobar_l.astype(dtype))

    f3 = eam_pass3_stencil(geom, pot, r, df_embed, chunk=chunk,
                           interpret=interpret, half=half)
    if half:
        # fold is linear: one halo force exchange on the summed passes
        return fold(f1 + f3).astype(dtype), u, df_embed
    return (f1 + f3).astype(dtype), u, df_embed


def eam_force_nl(
    nlist,
    pot: EamPotential,
    r,                       # [3, B, A] with halo cells filled
    fill_halo_scalar: Callable,
    *,
    spline: bool = False,
    chunk: int = 2048,
    e_dtype=jnp.float64,
    interp_impl: str = "rows",
    want_energy: bool = True,
):
    """EAM via Verlet neighbor list (thread_atom_nl / warp_atom_nl analog).

    Returns (force [3, B, A], ePot, dfEmbed [B, A]).  Reference NL path:
    eamForceCpuNL (eam.c:266-419), GPU *_nl kernels
    (gpu_eam_thread_atom.h:144-266).
    """
    from . import neighborlist as nlmod
    dtype = r.dtype
    B, A = r.shape[1], r.shape[2]
    rcut2 = pot.cutoff * pot.cutoff
    eval_phi, eval_rho = make_evaluators(pot, dtype, spline, interp_impl)
    eval_f = make_f_eval(pot, dtype, interp_impl)

    f1, scal = nlmod.pair_sweep_nl(
        nlist, r, make_pair1(eval_phi, eval_rho, want_energy), rcut2,
        chunk=chunk)
    phi_rows, rho_rows = scal if want_energy else (None, scal[0])

    # pass 2: embedding per row
    f_emb, df_rows = eval_f(rho_rows)
    if want_energy:
        u_rows = 0.5 * phi_rows.astype(e_dtype) + f_emb.astype(e_dtype)
        u_rows = jnp.where(nlist.a_valid, u_rows, 0.0)
        e_pot = jnp.sum(u_rows)
    else:
        e_pot = None

    df_embed = nlmod.scatter_rows(
        nlist, jnp.where(nlist.a_valid, df_rows, 0.0).astype(dtype), B, A)
    # NL rows carry rhobar per row, not per cell slot; the fused ki push
    # needs the cell layout, so the NL path uses the unfused transports
    df_embed = fill_halo_scalar(df_embed)

    f3, _ = nlmod.pair_sweep_nl(
        nlist, r, make_pair3(eval_rho), rcut2, chunk=chunk,
        scalar_j=[df_embed])

    force = nlmod.scatter_rows(nlist, f1 + f3, B, A)
    return force, e_pot, df_embed


def eam_force_nl_split(
    nlist,
    pot: EamPotential,
    r,                       # [3, B, A] post-exchange (ghosts refreshed)
    fill_halo_scalar: Callable,
    n_rows_interior: int,    # static: rows [0, Ri) are interior-cell atoms
    *,
    r_pre=None,              # pre-exchange positions for interior sweeps
    spline: bool = False,
    chunk: int = 2048,
    e_dtype=jnp.float64,
    interp_impl: str = "rows",
    want_energy: bool = True,
):
    """EAM NL force with the interior/boundary row split (-a 1 on the NL
    methods, the reference's timestep.c:257-265 / :328-351 overlap).

    Requires a NeighborList built with row_split (interior rows first):
    interior rows' entries reference only local cells, so their pass-1/3
    sweeps read pre-exchange positions and pre-exchange dfEmbed, carrying
    no data dependency on the position/dfEmbed collectives -- XLA is free
    to overlap them (see eam_force_split for the cell-path analog).

    Returns (force [3, B, A], ePot, dfEmbed [B, A]).
    """
    from . import neighborlist as nlmod
    dtype = r.dtype
    B, A = r.shape[1], r.shape[2]
    rcut2 = pot.cutoff * pot.cutoff
    eval_phi, eval_rho = make_evaluators(pot, dtype, spline, interp_impl)
    eval_f = make_f_eval(pot, dtype, interp_impl)
    pair1 = make_pair1(eval_phi, eval_rho, want_energy)
    pair3 = make_pair3(eval_rho)
    r_pre = r if r_pre is None else r_pre
    n_rows = nlist.a_list.shape[0]
    nl_i = nlmod.slice_rows(nlist, 0, n_rows_interior)
    nl_b = nlmod.slice_rows(nlist, n_rows_interior, n_rows)

    # pass 1: interior rows on pre-exchange positions
    f1_i, scal_i = nlmod.pair_sweep_nl(nl_i, r_pre, pair1, rcut2,
                                       chunk=chunk)
    f1_b, scal_b = nlmod.pair_sweep_nl(nl_b, r, pair1, rcut2, chunk=chunk)
    phi_i, rho_i = scal_i if want_energy else (None, scal_i[0])
    phi_b, rho_b = scal_b if want_energy else (None, scal_b[0])

    # pass 2 per segment
    femb_i, df_i = eval_f(rho_i)
    femb_b, df_b = eval_f(rho_b)
    if want_energy:
        u_rows = jnp.concatenate([
            0.5 * phi_i.astype(e_dtype) + femb_i.astype(e_dtype),
            0.5 * phi_b.astype(e_dtype) + femb_b.astype(e_dtype)])
        e_pot = jnp.sum(jnp.where(nlist.a_valid, u_rows, 0.0))
    else:
        e_pot = None

    df_rows = jnp.concatenate([df_i, df_b]).astype(dtype)
    df_local = nlmod.scatter_rows(
        nlist, jnp.where(nlist.a_valid, df_rows, 0.0), B, A)

    # pass 3 interior is independent of the dfEmbed exchange (interior
    # rows only read local dfEmbed); boundary waits for it
    f3_i, _ = nlmod.pair_sweep_nl(nl_i, r_pre, pair3, rcut2, chunk=chunk,
                                  scalar_j=[df_local])
    df_full = fill_halo_scalar(df_local)
    f3_b, _ = nlmod.pair_sweep_nl(nl_b, r, pair3, rcut2, chunk=chunk,
                                  scalar_j=[df_full])

    f_rows = jnp.concatenate([f1_i + f3_i, f1_b + f3_b], axis=1)
    force = nlmod.scatter_rows(nlist, f_rows, B, A)
    return force, e_pot, df_full


def _scatter_lists(n_local, interior, boundary, vi, vb):
    """Assemble per-list sweep outputs into full [.., n_local, A] arrays."""
    A = vi.shape[-1]
    lead = vi.shape[:-2]
    out = jnp.zeros(lead + (n_local, A), dtype=vi.dtype)
    ii = jnp.asarray(interior)
    bb = jnp.asarray(boundary)
    out = out.at[..., ii, :].set(vi)
    out = out.at[..., bb, :].set(vb)
    return out


def eam_force_split(
    geom: CellGeometry,
    pot: EamPotential,
    r,                          # [3, B, A] post-exchange (ghosts filled)
    fill_halo_scalar: Callable,
    interior,                   # static local box id lists
    boundary,
    *,
    r_pre=None,                 # pre-exchange positions; interior sweeps use
                                # these so XLA can overlap the exchanges with
                                # interior compute (-a 1, eam.c:196-264)
    spline: bool = False,
    chunk: int = 256,
    e_dtype=jnp.float64,
    interp_impl: str = "rows",
    want_energy: bool = True,
):
    """EAM force with the interior/boundary split (the gpuAsync capability).

    Interior cells never touch halo data: their pass-1/3 sweeps read only
    pre-exchange positions and pre-exchange dfEmbed, so they carry no data
    dependency on the collectives -- the XLA scheduler is free to overlap
    them, which is the TPU-native expression of the reference's
    interior_stream/boundary_stream design (gpu_utility.c:73-163,
    timestep.c:257-265).

    Returns (force [3, n_local, A], u_raw [n_local, A], dfEmbed [B, A]).
    """
    dtype = r.dtype
    B, A = r.shape[1], r.shape[2]
    rcut2 = pot.cutoff * pot.cutoff
    eval_phi, eval_rho = make_evaluators(pot, dtype, spline, interp_impl)
    eval_f = make_f_eval(pot, dtype, interp_impl)
    pair1 = make_pair1(eval_phi, eval_rho, want_energy)
    pair3 = make_pair3(eval_rho)
    r_pre = r if r_pre is None else r_pre

    # pass 1: interior on pre-exchange positions, boundary on final ones
    f1_i, scal_i = cell_pair_sweep(
        geom, r_pre, pair1, rcut2, chunk=chunk, boxes=interior)
    f1_b, scal_b = cell_pair_sweep(
        geom, r, pair1, rcut2, chunk=chunk, boxes=boundary)
    phi_i, rho_i = scal_i if want_energy else (None, scal_i[0])
    phi_b, rho_b = scal_b if want_energy else (None, scal_b[0])

    # pass 2 per list
    femb_i, dfe_i = eval_f(rho_i)
    femb_b, dfe_b = eval_f(rho_b)

    u_raw = _scatter_lists(
        geom.n_local, interior, boundary,
        0.5 * phi_i.astype(e_dtype) + femb_i.astype(e_dtype),
        0.5 * phi_b.astype(e_dtype) + femb_b.astype(e_dtype)) \
        if want_energy else None

    df_local = jnp.zeros((B, A), dtype=dtype)
    df_local = df_local.at[:geom.n_local].set(_scatter_lists(
        geom.n_local, interior, boundary,
        dfe_i.astype(dtype), dfe_b.astype(dtype)))

    # pass 3 interior is independent of the dfEmbed exchange (interior
    # neighborhoods only read local dfEmbed); boundary waits for it
    f3_i, _ = cell_pair_sweep(geom, r_pre, pair3, rcut2, chunk=chunk,
                              boxes=interior, scalar_j=[df_local])
    rho_cells = _scatter_lists(geom.n_local, interior, boundary,
                               rho_i.astype(dtype), rho_b.astype(dtype))
    df_full = fill_halo_scalar(df_local, rhobar_l=rho_cells)
    f3_b, _ = cell_pair_sweep(geom, r, pair3, rcut2, chunk=chunk,
                              boxes=boundary, scalar_j=[df_full])

    force = _scatter_lists(geom.n_local, interior, boundary,
                           f1_i + f3_i, f1_b + f3_b)
    return force, u_raw, df_full


def finalize_eam_energy(u, valid_mask, e_dtype=jnp.float64):
    """Mask embedding energy of empty slots and reduce.

    pass 2 assigns F(rhobar=0) != 0 to every slot; only slots holding real
    atoms contribute (reference loops over nAtoms per box, eam.c:353-366).
    """
    u = jnp.where(valid_mask, u, 0.0)
    return u, jnp.sum(u.astype(e_dtype))
