"""Newton's-3rd-law half sweep vs the full 27-cell sweep.

The half sweep must reproduce the full sweep to fp-reordering tolerance on
every path (serial, sharded), since it computes the identical pair set with
each pair evaluated once and the j side delivered by overlap-add + halo
fold (the half-shell force exchange)."""
import jax
import numpy as np
import pytest

from comd_tpu import Config, init_simulation


def base(**kw):
    kw = dict(dict(nx=6, ny=6, nz=6), **kw)
    return Config(temperature=600.0, dtype="float64",
                  max_atoms=48, box_chunk=64, pot_dir="pots", **kw)


@pytest.mark.parametrize("doeam", [False, True])
def test_half_matches_full_serial(doeam):
    full = init_simulation(base(half_shell=False, doeam=doeam))
    half = init_simulation(base(half_shell=True, doeam=doeam))
    assert half.e_potential == pytest.approx(full.e_potential, abs=1e-9)
    np.testing.assert_allclose(np.asarray(half.state.f),
                               np.asarray(full.state.f), atol=1e-12)
    full.step_block(8)
    half.step_block(8)
    assert half.sum_atoms() == half.n_global
    assert half.e_potential == pytest.approx(full.e_potential, abs=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("doeam", [False, True])
def test_half_matches_full_sharded(doeam):
    kw = dict(nx=8, ny=8, nz=8, doeam=doeam, xproc=2, yproc=2, zproc=2)
    full = init_simulation(base(half_shell=False, **kw))
    half = init_simulation(base(half_shell=True, **kw))
    assert half.e_potential == pytest.approx(full.e_potential, abs=1e-9)
    full.step_block(10)
    half.step_block(10)
    assert half.sum_atoms() == half.n_global
    assert half.e_potential == pytest.approx(full.e_potential, abs=1e-9)


@pytest.mark.parametrize("doeam", [False, True])
@pytest.mark.parametrize("materialize", [False, True])
def test_half_window_fetch_matches_slices(doeam, materialize):
    """The window-fetch half sweep (ONE contiguous per-chunk window, all 14
    stencil views as static in-window slices -- the round-3d window fetch
    applied to the half sweep) must be BITWISE identical to the per-offset
    dynamic-slice formulation: same pair set, same reduction order, only
    the fetch addressing changes.  Same for the optimization_barrier
    materialize knob (scheduling, not math)."""
    a = init_simulation(base(half_shell=True, doeam=doeam))
    b = init_simulation(base(half_shell=True, doeam=doeam,
                             half_fetch="window",
                             half_materialize=materialize))
    assert b.e_potential == a.e_potential  # bitwise
    np.testing.assert_array_equal(np.asarray(b.state.f),
                                  np.asarray(a.state.f))
    a.step_block(6)
    b.step_block(6)
    assert b.sum_atoms() == b.n_global
    assert b.e_potential == a.e_potential  # bitwise


def test_half_shell_momentum_conserved():
    """Antisymmetric pair delivery must conserve total momentum exactly
    (up to fp) -- a direct check of the i/j force split + fold."""
    sim = init_simulation(base(doeam=True))
    sim.step_block(10)
    p = np.asarray(sim.state.p[:, :sim.geom.n_local])
    gid = np.asarray(sim.state.gid[:sim.geom.n_local])
    p = np.where(gid[None] != np.iinfo(np.int32).max, p, 0.0)
    assert np.max(np.abs(p.sum(axis=(1, 2)))) < 1e-9
