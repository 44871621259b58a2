"""Dense stencil sweeps (sweep_impl='dense'/'dense_t') vs the gather sweep.

Same physics, different data layout (cells on lanes; round-3 bandwidth
optimization for A<32 capacities).  Forces/energies must agree to fp
round-off; summation order differs so exact bitwise equality is not
required.
"""
import numpy as np
import pytest

from comd_tpu.config import Config
from comd_tpu import sim as sim_mod


def run(sweep_impl, **kw):
    kw = dict(dict(nx=8, ny=8, nz=8), **kw)
    cfg = Config(n_steps=10, dtype="float64",
                 sweep_impl=sweep_impl, **kw)
    s = sim_mod.init_simulation(cfg)
    s.step_block(10)
    return s


@pytest.mark.parametrize("impl", ["dense_t", "dense", "dense_w", "dense_wg", "dense_wf", "dense_f"])
@pytest.mark.parametrize("kw", [
    dict(doeam=False),
    dict(doeam=True),
    dict(doeam=True, pot_type="setfl", pot_name="Cu01.eam.alloy"),
])
def test_dense_matches_gather(impl, kw):
    a = run("gather", **kw)
    b = run(impl, **kw)
    assert b.sum_atoms() == a.sum_atoms()
    assert b.e_potential == pytest.approx(a.e_potential, rel=1e-12)
    assert b.kinetic_energy() == pytest.approx(a.kinetic_energy(), rel=1e-12)
    np.testing.assert_allclose(
        np.asarray(b.state.r), np.asarray(a.state.r), atol=1e-9)


@pytest.mark.parametrize("impl", ["dense_t", "dense", "dense_w", "dense_wg", "dense_wf", "dense_f"])
def test_dense_k3_capacity16(impl):
    """The target config: k=3 commensurate cells, A=16 (nx=9 forces k=3)."""
    a = run("gather", doeam=True, nx=9, ny=9, nz=9)
    b = run(impl, doeam=True, nx=9, ny=9, nz=9)
    assert a.cfg.max_atoms == 16
    assert b.e_potential == pytest.approx(a.e_potential, rel=1e-12)


@pytest.mark.fast
def test_auto_resolution():
    c16 = Config(max_atoms=16)
    c32 = Config(max_atoms=32)
    c256 = Config(max_atoms=256)
    assert c16.resolved_sweep_impl == "dense_w"
    assert c32.resolved_sweep_impl == "dense_w"
    assert c256.resolved_sweep_impl == "gather"
    # chunk auto follows sweep choice AND capacity (A=32 spills at C>256);
    # explicit values pass through
    assert c16.resolved_box_chunk == 1024
    assert c32.resolved_box_chunk == 256
    assert Config(max_atoms=32, sweep_impl="dense").resolved_box_chunk == 256
    assert Config(max_atoms=16, box_chunk=64).resolved_box_chunk == 64
    # -m warp_atom is the gather-pinned tuning point (explicit overrides)
    assert Config(max_atoms=16, method="warp_atom").resolved_sweep_impl \
        == "gather"
    assert Config(max_atoms=16, method="warp_atom",
                  sweep_impl="dense_w").resolved_sweep_impl == "dense_w"


def test_dense_w_matches_gather_big_a_5sigma():
    """Big-A coverage of the window sweep: the fork's 5-sigma LJ cutoff
    (ljForce.c:102-120) plans k=7 commensurate cells with A=176 -- far
    above the dense_w auto range (gather is the measured winner there by
    1.66-2.0x, round-5 batch 4), but the formulation must stay CORRECT at
    any capacity a user pins explicitly."""
    kw = dict(doeam=False, nx=7, ny=7, nz=7, lj_cutoff_factor=5.0)
    a = run("gather", **kw)
    b = run("dense_w", **kw)
    assert a.cfg.max_atoms > 32          # really the big-A regime
    assert a.cfg.resolved_sweep_impl == "gather"   # the auto answer
    assert b.e_potential == pytest.approx(a.e_potential, rel=1e-12)
    np.testing.assert_allclose(
        np.asarray(b.state.r), np.asarray(a.state.r), atol=1e-9)


def test_warp_atom_matches_thread_atom():
    """-m warp_atom (gather-pinned) must produce the same physics as the
    auto thread_atom formulation."""
    a = run("auto", doeam=True, method="thread_atom")
    b = run("auto", doeam=True, method="warp_atom")
    assert b.cfg.resolved_sweep_impl == "gather"
    assert b.e_potential == pytest.approx(a.e_potential, abs=1e-9)


@pytest.mark.parametrize("impl", ["dense_t", "dense", "dense_w", "dense_wg", "dense_wf", "dense_f"])
def test_dense_sharded_matches_serial(impl):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    # nx=9/px=3: per-shard m=6, k=3 -> A=16, the dense auto target
    s1 = run(impl, doeam=True, nx=9, ny=9, nz=9)
    cfg8 = Config(nx=9, ny=9, nz=9, n_steps=10, dtype="float64",
                  sweep_impl=impl, doeam=True,
                  xproc=3, yproc=1, zproc=1)
    s8 = sim_mod.init_simulation(cfg8)
    assert s8.cfg.max_atoms == 16
    s8.step_block(10)
    assert s8.e_potential == pytest.approx(s1.e_potential, abs=1e-8)


@pytest.mark.parametrize("impl", ["dense_w", "dense_f"])
def test_dense_noncubic_grid(impl):
    """Window arithmetic (pad = XY+X+1 from a non-square slab) on an
    anisotropic grid: gx != gy != gz exercises asymmetric dense strides."""
    a = run("gather", doeam=True, nx=10, ny=8, nz=6)
    b = run(impl, doeam=True, nx=10, ny=8, nz=6)
    assert b.sum_atoms() == a.sum_atoms()
    assert b.e_potential == pytest.approx(a.e_potential, rel=1e-12)
    np.testing.assert_allclose(
        np.asarray(b.state.r), np.asarray(a.state.r), atol=1e-9)
