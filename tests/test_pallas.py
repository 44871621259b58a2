"""Pallas stencil force kernel vs the XLA sweep (interpret mode on CPU).

The kernel computes in f32 (the TPU production path); comparisons against
the XLA sweep run both sides at f32 and allow fp-reordering tolerance.
On real hardware the same kernel compiles via Mosaic (tools/pallas_probe.py
verified the constructs; bench runs exercise it end-to-end).
"""
import numpy as np
import pytest

from comd_tpu import Config, init_simulation


def base_cfg(**kw):
    return Config(nx=6, ny=6, nz=6, temperature=600.0, dtype="float32",
                  max_atoms=48, box_chunk=32, pot_dir="pots", **kw)


def test_lj_stencil_matches_xla_sweep():
    ref = init_simulation(base_cfg())
    pal = init_simulation(base_cfg(method="cta_cell"))
    assert pal.e_potential == pytest.approx(ref.e_potential, rel=1e-6)
    ref.step_block(6)
    pal.step_block(6)
    assert pal.sum_atoms() == ref.n_global
    assert pal.e_potential == pytest.approx(ref.e_potential, rel=1e-5)
    np.testing.assert_allclose(np.asarray(pal.state.p),
                               np.asarray(ref.state.p), atol=2e-4)


def test_eam_stencil_matches_xla_cheb():
    """Pallas EAM (in-kernel cheb) vs the XLA sweep with the same cheb
    evaluators: identical table representation, different sweep order."""
    ref = init_simulation(base_cfg(doeam=True, interp_impl="cheb"))
    pal = init_simulation(base_cfg(doeam=True, method="cta_cell"))
    assert pal.e_potential == pytest.approx(ref.e_potential, rel=1e-6)
    ref.step_block(6)
    pal.step_block(6)
    assert pal.sum_atoms() == ref.n_global
    assert pal.e_potential == pytest.approx(ref.e_potential, rel=1e-5)


def test_eam_stencil_conserves_energy():
    sim = init_simulation(base_cfg(doeam=True, method="cta_cell"))
    e0 = sim.e_potential + sim.kinetic_energy()
    sim.step_block(30)
    e1 = sim.e_potential + sim.kinetic_energy()
    assert abs(e1 - e0) / abs(e0) < 5e-5
    assert not bool(np.asarray(sim.state.overflow))


def test_stencil_chunking_invariance():
    """Kernel results must not depend on the chunk/window partition."""
    import jax.numpy as jnp
    from comd_tpu.ops.pallas.stencil import lj_force_stencil
    a = init_simulation(base_cfg())
    f1, u1, e1 = lj_force_stencil(a.geom, a.pot, a.state.r, chunk=128,
                                  interpret=True)
    f2, u2, e2 = lj_force_stencil(a.geom, a.pot, a.state.r, chunk=512,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert float(e1) == pytest.approx(float(e2), rel=1e-7)


def test_lj_stencil_half_matches_xla():
    """Pallas half-shell kernel (pair-once, dual delivery) vs the XLA full
    sweep: same physics, fp-reordering differences only."""
    a = init_simulation(base_cfg())
    b = init_simulation(base_cfg(method="cta_cell", half_shell=True))
    assert b.e_potential == pytest.approx(a.e_potential, rel=1e-6)
    fa = np.asarray(a.state.f)
    fb = np.asarray(b.state.f)
    assert np.max(np.abs(fa - fb)) < 1e-4
    a.step_block(5)
    b.step_block(5)
    assert b.sum_atoms() == a.n_global
    assert b.e_potential == pytest.approx(a.e_potential, rel=1e-5)


def test_eam_stencil_half_matches_xla_cheb():
    a = init_simulation(base_cfg(doeam=True, interp_impl="cheb"))
    b = init_simulation(base_cfg(doeam=True, method="cta_cell",
                                 half_shell=True))
    assert b.e_potential == pytest.approx(a.e_potential, rel=1e-6)
    fa = np.asarray(a.state.f)
    fb = np.asarray(b.state.f)
    assert np.max(np.abs(fa - fb)) < 1e-4
    a.step_block(5)
    b.step_block(5)
    assert b.sum_atoms() == a.n_global
    assert b.e_potential == pytest.approx(a.e_potential, rel=1e-5)


def test_eam_stencil_half_conserves_energy():
    sim = init_simulation(base_cfg(doeam=True, method="cta_cell",
                                   half_shell=True))
    e0 = sim.e_potential + sim.kinetic_energy()
    sim.step_block(30)
    e1 = sim.e_potential + sim.kinetic_energy()
    assert abs(e1 - e0) / abs(e0) < 5e-5
    assert not bool(np.asarray(sim.state.overflow))
