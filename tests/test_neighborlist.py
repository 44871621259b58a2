"""Verlet neighbor-list path (*_nl methods) vs. the cell-sweep oracle.

Reference contract: the NL methods are alternative kernels for the same
physics (dispatch: gpu_kernels.cu:70-122); energies must agree with the
direct cell sweep, and the skin/2 rebuild trigger must keep the trajectory
correct between rebuilds (neighborList.c:212-247).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from comd_tpu import Config, init_simulation
from comd_tpu.ops import neighborlist as nlmod


def base_cfg(**kw):
    return Config(nx=6, ny=6, nz=6, temperature=600.0, dtype="float64",
                  max_atoms=40, box_chunk=32, nl_chunk=512,
                  pot_dir="pots", **kw)


def test_build_counts_match_bruteforce():
    cfg = base_cfg(method="thread_atom_nl")
    sim = init_simulation(cfg)
    nl = sim.nlist
    assert nl is not None
    r_flat = np.asarray(sim.state.r).reshape(3, -1)
    a = np.asarray(nl.a_list)
    valid = np.asarray(nl.a_valid)
    nlist = np.asarray(nl.nl)
    rcut_nl = sim.pot.cutoff + sim.skin
    # brute-force check a sample of rows
    rng = np.random.default_rng(0)
    for i in rng.choice(np.flatnonzero(valid), size=20, replace=False):
        ri = r_flat[:, a[i]]
        d2 = ((r_flat - ri[:, None]) ** 2).sum(axis=0)
        want = set(np.flatnonzero((d2 <= rcut_nl ** 2) & (d2 > 0)))
        got = set(nlist[i]) - {a[i]}
        assert got == want, f"row {i}"


def test_build_chunk_invariant_through_vmem_clamp():
    """The scoped-VMEM chunk clamp (neighborlist._BUILD_TOPK_VMEM_BUDGET)
    must not change the built list: at A=40 the default chunk 2048 clamps
    to <=640, so compare a clamped build against an explicit tiny chunk."""
    cfg = base_cfg(method="thread_atom_nl")
    sim = init_simulation(cfg)
    params = sim._nl_build_params()
    assert nlmod._BUILD_TOPK_VMEM_BUDGET // (27 * 40 * 8) < 2048
    big = dict(params, chunk=2048)   # clamped internally
    small = dict(params, chunk=128)
    nl_big, ovf_big = nlmod.build(sim.geom, sim.state.r, sim.state.n_atoms,
                                  **big)
    nl_small, ovf_small = nlmod.build(sim.geom, sim.state.r,
                                      sim.state.n_atoms, **small)
    assert bool(ovf_big) == bool(ovf_small)
    np.testing.assert_array_equal(np.asarray(nl_big.nl),
                                  np.asarray(nl_small.nl))
    np.testing.assert_array_equal(np.asarray(nl_big.a_list),
                                  np.asarray(nl_small.a_list))


def test_nl_lj_matches_cell_sweep():
    cell = init_simulation(base_cfg())
    nl = init_simulation(base_cfg(method="thread_atom_nl"))
    assert nl.e_potential == pytest.approx(cell.e_potential, abs=1e-9)
    cell.step_block(15)
    nl.step_block(15)
    assert nl.sum_atoms() == nl.n_global
    assert nl.e_potential == pytest.approx(cell.e_potential, abs=1e-7)
    assert nl.kinetic_energy() == pytest.approx(
        cell.kinetic_energy(), abs=1e-7)


def test_nl_eam_matches_cell_sweep():
    cell = init_simulation(base_cfg(doeam=True))
    nl = init_simulation(base_cfg(doeam=True, method="warp_atom_nl"))
    assert nl.e_potential == pytest.approx(cell.e_potential, abs=1e-9)
    cell.step_block(15)
    nl.step_block(15)
    assert nl.sum_atoms() == nl.n_global
    assert nl.e_potential == pytest.approx(cell.e_potential, abs=1e-7)


def test_pairlist_flag_uses_nl():
    sim = init_simulation(base_cfg(use_pairlist=True))
    assert sim.uses_nl
    sim.step_block(5)
    assert sim.sum_atoms() == sim.n_global


def test_nl_conservation_through_rebuilds():
    """Long enough that skin/2 displacement forces several rebuilds."""
    sim = init_simulation(base_cfg(doeam=True, method="thread_atom_nl"))
    e0 = (sim.e_potential + sim.kinetic_energy()) / sim.n_global
    sim.step_block(60)
    e1 = (sim.e_potential + sim.kinetic_energy()) / sim.n_global
    assert sim.sum_atoms() == sim.n_global
    assert abs(e1 - e0) < 3e-5 * abs(e0)
