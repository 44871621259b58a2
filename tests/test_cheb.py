"""Chebyshev-in-r^2 EAM fast path: accuracy vs the exact-table path, and
energy conservation (forces are the exact gradient of the fitted energy)."""
import jax.numpy as jnp
import numpy as np
import pytest

from comd_tpu import Config, init_simulation
from comd_tpu.potentials import tables
from comd_tpu.potentials.eam import init_eam_pot


@pytest.mark.parametrize("pot_name,pot_type", [
    ("Cu_u6.eam", "funcfl"), ("Cu01.eam.alloy", "setfl")])
def test_cheb_matches_reference_interpolant(pot_name, pot_type):
    pot = init_eam_pot("pots", pot_name, pot_type)
    r = np.linspace(pot.CHEB_R_LO + 0.01, pot.cutoff, 20001)
    for tab, ch in ((pot.phi, pot.cheb_phi), (pot.rho, pot.cheb_rho)):
        f_ref, df_ref = tables.interpolate4(
            tab.stencil_device(jnp.float64), tab.n, tab.x0, tab.inv_dx,
            jnp.asarray(r))
        r2 = jnp.asarray(r ** 2, jnp.float32)
        f, df = tables.interpolate_cheb(ch.coef, ch.dcoef, ch.u_lo, ch.u_hi,
                                        r2, jnp.asarray(r, jnp.float32))
        scale_f = np.max(np.abs(np.asarray(f_ref)))
        scale_df = np.max(np.abs(np.asarray(df_ref)))
        assert np.max(np.abs(np.asarray(f) - np.asarray(f_ref))) < \
            5e-5 * scale_f
        assert np.max(np.abs(np.asarray(df) - np.asarray(df_ref))) < \
            5e-3 * scale_df


def test_cheb_energy_close_to_golden():
    """T=0 cohesive energy via the cheb path lands within the fit tolerance
    of the f64 golden (-3.538079224691 eV/atom for Cu_u6)."""
    cfg = Config(nx=4, ny=4, nz=4, doeam=True, temperature=0.0,
                 dtype="float32", max_atoms=48, box_chunk=32,
                 pot_dir="pots", interp_impl="cheb")
    sim = init_simulation(cfg)
    e_atom = sim.e_potential / sim.n_global
    assert e_atom == pytest.approx(-3.538079224691, abs=2e-4)


def test_cheb_conserves_energy():
    cfg = Config(nx=4, ny=4, nz=4, doeam=True, temperature=600.0,
                 dtype="float32", max_atoms=48, box_chunk=32,
                 pot_dir="pots", interp_impl="cheb")
    sim = init_simulation(cfg)
    e0 = sim.e_potential + sim.kinetic_energy()
    sim.step_block(40)
    e1 = sim.e_potential + sim.kinetic_energy()
    assert abs(e1 - e0) / abs(e0) < 5e-5


def test_cheb_trajectory_matches_rows():
    """Short f32 trajectories via cheb vs exact rows stay close (the force
    fields differ by <= the fit's derivative tolerance)."""
    kw = dict(nx=4, ny=4, nz=4, doeam=True, temperature=600.0,
              dtype="float32", max_atoms=48, box_chunk=32, pot_dir="pots")
    a = init_simulation(Config(interp_impl="cheb", **kw))
    b = init_simulation(Config(interp_impl="rows", **kw))
    a.step_block(10)
    b.step_block(10)
    assert float(a.state.e_potential) == pytest.approx(
        float(b.state.e_potential), rel=1e-4)
    ra = np.asarray(a.state.r[:, :a.geom.n_local])
    rb = np.asarray(b.state.r[:, :b.geom.n_local])
    valid = ra < 1e9
    assert np.max(np.abs(np.where(valid, ra - rb, 0.0))) < 1e-3


def test_fused_matches_reference_interpolant():
    """eval_cheb_fused (shared basis, transformed coordinate) meets the fit
    tolerances vs the exact reference interpolant for both potentials."""
    for pot_name, pot_type in (("Cu_u6.eam", "funcfl"),
                               ("Cu01.eam.alloy", "setfl")):
        pot = init_eam_pot("pots", pot_name, pot_type)
        fz = pot.cheb_pair
        r = np.linspace(pot.CHEB_R_LO + 0.01, pot.cutoff - 1e-6, 20001)
        r2 = jnp.asarray(r ** 2, jnp.float32)
        phi, dphi, rho, drho = tables.eval_cheb_fused(
            fz, r2, [("phi", "val"), ("phi", "der"),
                     ("rho", "val"), ("rho", "der")])
        for name, tab, f, d in (("phi", pot.phi, phi, dphi),
                                ("rho", pot.rho, rho, drho)):
            f_ref, df_ref = tables.interpolate4(
                tab.stencil_device(jnp.float64), tab.n, tab.x0, tab.inv_dx,
                jnp.asarray(r))
            f_ref = np.asarray(f_ref)
            df_ref = np.asarray(df_ref)
            # der contract: (1/r) * df/dr
            df = np.asarray(d) * r
            assert np.max(np.abs(np.asarray(f) - f_ref)) < \
                1e-4 * np.max(np.abs(f_ref)), name
            assert np.max(np.abs(df - df_ref)) < \
                5e-3 * np.max(np.abs(df_ref)), name


@pytest.mark.parametrize("doeam", [True, False])
def test_lazy_energy_block_matches_full(doeam):
    """Blocks with energy only on the last step produce bitwise-identical
    trajectories AND the same boundary energy as energy-every-step blocks
    (forces are identical; only reporting work is skipped)."""
    kw = dict(nx=4, ny=4, nz=4, doeam=doeam, temperature=600.0,
              dtype="float32", max_atoms=48, box_chunk=32, pot_dir="pots")
    a = init_simulation(Config(energy_every_step=False, **kw))
    b = init_simulation(Config(energy_every_step=True, **kw))
    for _ in range(3):
        a.step_block(7)
        b.step_block(7)
        assert float(a.state.e_potential) == float(b.state.e_potential)
    assert np.array_equal(np.asarray(a.state.r), np.asarray(b.state.r))
    assert np.array_equal(np.asarray(a.state.p), np.asarray(b.state.p))


def test_constrained_fit_exact_endpoint_zeros():
    """make_cheb_fused(constraints=...) places exact (f64) zeros at the
    cutoff endpoint: value for 'val', value+derivative for 'val_der'."""
    pot = init_eam_pot("pots", "Cu_u6.eam", "funcfl")
    fz = tables.make_cheb_fused(
        {"phi": pot.phi, "rho": pot.rho}, pot.CHEB_R_LO, pot.cutoff,
        constraints={"phi": "val_der", "rho": "val"})
    for name, mode in (("phi", "val_der"), ("rho", "val")):
        ch = np.polynomial.chebyshev.Chebyshev(
            fz.coef[name], domain=[fz.w_lo, fz.w_hi])
        w_end = (1.0 / fz.u_hi if fz.transform == "inv_u" else
                 np.log(fz.u_hi) if fz.transform == "log_u" else fz.u_hi)
        assert abs(ch(w_end)) < 1e-12
        if mode == "val_der":
            assert abs(ch.deriv()(w_end)) < 1e-10
        assert name in fz.self_val
    # constrained fits still meet the quality bar on the sampled range
    r = np.linspace(pot.CHEB_R_LO + 0.01, pot.cutoff, 20001)
    r2 = jnp.asarray(r ** 2, jnp.float64)
    phi, dphi = tables.eval_cheb_fused(fz, r2, [("phi", "val"),
                                                ("phi", "der")])
    f_ref, df_ref = tables.interpolate4(
        pot.phi.stencil_device(jnp.float64), pot.phi.n, pot.phi.x0,
        pot.phi.inv_dx, jnp.asarray(r))
    assert np.max(np.abs(np.asarray(phi) - np.asarray(f_ref))) < \
        1e-4 * np.max(np.abs(np.asarray(f_ref)))
