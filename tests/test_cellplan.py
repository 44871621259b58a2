"""Lattice-commensurate cell planning (cells.plan_cells).

The TPU sweep pays for capacity *slots*, not atoms (docs/BENCHMARKS.md round
2b), so cell sizing is a first-class performance decision.  These tests pin
the planner's choices and the occupancy invariants they rely on, and verify
physics is invariant under the sizing mode (it is a pure partition choice).
"""
import numpy as np
import pytest

from comd_tpu import cells, lattice
from comd_tpu.config import Config
from comd_tpu import sim as sim_mod

LAT = 3.615


def _fcc(n):
    ext = np.full(3, n * LAT)
    r, gid = lattice.create_fcc_lattice(n, n, n, LAT, np.zeros(3), ext)
    return r


def plan(n, cutoff, *, procs=(1, 1, 1), skin_rel=0.1, mode="auto",
         max_atoms=0, lazy=True):
    r = _fcc(n)
    return cells.plan_cells(
        cutoff=cutoff, lat=LAT, n_cells=(n, n, n), proc_grid=procs,
        r_global=r, skin_req=cutoff * skin_rel, lazy=lazy, mode=mode,
        max_atoms=max_atoms)


class TestPlanChoices:
    def test_eam_k3_uniform_occupancy(self):
        # nx=9: 2n=18, k=4 infeasible -> k=3: cell = 1.5*lat, occupancy
        # uniformly 13/14, A=16
        p = plan(9, 4.95)
        assert p.mode == "commensurate"
        np.testing.assert_allclose(p.cell_size, 1.5 * LAT)
        assert p.t0_max_occ == 14
        assert p.max_atoms == 16
        # site planes sit 0.25*lat from every cell face
        assert p.boundary_margin == pytest.approx(0.25 * LAT, abs=1e-9)
        assert p.skin == pytest.approx(1.5 * LAT - 4.95)

    def test_eam_k3_beats_exact_pack(self):
        # nx=12 admits both k=3 and k=4; since the round-3 dense slice
        # sweep recovered most of the A<32 per-slot-pair penalty (1.25x at
        # chunk=1024), the v5e-calibrated cost model picks k=3 (half the
        # candidate slots; measured 36.5 vs 42.3 ns/atom on v5e)
        p = plan(12, 4.95)
        assert p.mode == "commensurate"
        np.testing.assert_allclose(p.cell_size, 1.5 * LAT)
        assert p.t0_max_occ == 14 and p.max_atoms == 16

    def test_eam_k4_exact_pack(self):
        # 2n = 40 not divisible by 3 -> k=4: cell = 2*lat, exactly 32/cell
        p = plan(20, 4.95)
        assert p.mode == "commensurate"
        np.testing.assert_allclose(p.cell_size, 2.0 * LAT)
        assert p.t0_max_occ == 32
        assert p.max_atoms == 32
        assert p.mean_occ == pytest.approx(32.0)

    def test_classic_spike(self):
        # the reference sizing carries the t=0 commensuration spike: peak
        # occupancy ~2.3x the mean (the round-2 cost ceiling)
        p = plan(12, 4.95, mode="classic")
        assert p.mode == "classic"
        assert p.t0_max_occ > 1.5 * p.mean_occ
        assert p.max_atoms == 32

    def test_auto_prefers_commensurate_when_cheaper(self):
        pa = plan(12, 4.95, mode="auto")
        pc = plan(12, 4.95, mode="classic")
        ca = cells._slot_cost(pa.max_atoms, pa.mean_occ)
        cc = cells._slot_cost(pc.max_atoms, pc.mean_occ)
        assert pa.mode == "commensurate" and ca < cc

    def test_explicit_capacity_respected(self):
        p = plan(12, 4.95, max_atoms=48)
        assert p.max_atoms == 48

    def test_sharded_divisibility(self):
        # 2*12/2 = 12 per shard: k in {3,4,6} all divide; the cost model
        # picks k=3 (dense slice sweep, see test_eam_k3_beats_exact_pack)
        p = plan(12, 4.95, procs=(2, 2, 2))
        assert p.mode == "commensurate"
        np.testing.assert_allclose(p.cell_size, 1.5 * LAT)

    def test_commensurate_infeasible_raises(self):
        # procs=7 does not divide 2*12=24
        with pytest.raises(ValueError):
            plan(12, 4.95, procs=(7, 1, 1), mode="commensurate")

    def test_infeasible_falls_back_to_classic(self):
        # 2*10=20 not divisible by px=3 -> commensurate impossible; the
        # classic grid (floor(12.05/5.445)=2 cells) is still legal
        p = plan(10, 4.95, procs=(3, 1, 1), mode="auto")
        assert p.mode == "classic"

    def test_delta_jitter_reflected_in_occupancy(self):
        # -r displacements shift the t=0 histogram; the planner measures the
        # jittered positions, not the ideal lattice
        n, cutoff = 12, 4.95
        r = _fcc(n)
        rng = np.random.RandomState(0)
        rj = r + rng.uniform(-1.2, 1.2, r.shape)   # beyond the 0.90 A margin
        p = cells.plan_cells(
            cutoff=cutoff, lat=LAT, n_cells=(n, n, n), proc_grid=(1, 1, 1),
            r_global=np.clip(rj, 0, n * LAT - 1e-9), skin_req=0.495,
            lazy=True, mode="commensurate")
        assert p.t0_max_occ > 14          # jitter breaks the uniform pack
        assert p.max_atoms >= 16


class TestPhysicsInvariance:
    """Cell sizing is a pure partition choice: same trajectory either way."""

    @pytest.mark.parametrize("doeam", [False, True])
    def test_energy_invariant_under_cell_mode(self, doeam):
        es = {}
        for mode in ("commensurate", "classic"):
            cfg = Config(doeam=doeam, nx=8, ny=8, nz=8, n_steps=10,
                         dtype="float64", cell_mode=mode, temperature=300.0)
            s = sim_mod.init_simulation(cfg)
            s.step_block(10)
            es[mode] = (s.e_potential + s.kinetic_energy()) / s.n_global
        assert es["commensurate"] == pytest.approx(es["classic"], abs=1e-9)

    def test_occupancy_stable_under_dynamics(self):
        # commensurate occupancy must not drift at 600 K (0.90 A margin vs
        # ~0.15 A thermal rms)
        cfg = Config(doeam=True, nx=12, ny=12, nz=12, n_steps=0)
        s = sim_mod.init_simulation(cfg)
        assert s.cfg.cell_mode == "commensurate"
        t0 = s.max_occupancy()
        for _ in range(4):
            s.step_block(10)
        assert not bool(np.any(np.asarray(s.state.overflow)))
        # after 40 fs at 600 K the peak may move by a slot or two at most
        assert s.max_occupancy() <= t0 + 2

    def test_sharded_matches_serial_commensurate(self):
        import jax
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        cfg = Config(doeam=True, nx=12, ny=12, nz=12, n_steps=10,
                     dtype="float64")
        s1 = sim_mod.init_simulation(cfg)
        s1.step_block(10)
        cfg8 = Config(doeam=True, nx=12, ny=12, nz=12, n_steps=10,
                      dtype="float64", xproc=2, yproc=2, zproc=2)
        s8 = sim_mod.init_simulation(cfg8)
        assert s8.cfg.cell_mode == "commensurate"
        s8.step_block(10)
        e1 = (s1.e_potential + s1.kinetic_energy()) / s1.n_global
        e8 = (s8.e_potential + s8.kinetic_energy()) / s8.n_global
        assert e1 == pytest.approx(e8, abs=1e-8)


def test_hot_run_gets_capacity_margin():
    """Near/above melting the commensurate stability argument weakens, so
    auto capacity pads by a margin (overflow abort remains the backstop)."""
    cfg = Config(doeam=True, nx=8, ny=8, nz=8, n_steps=0,
                 temperature=1400.0)
    s = sim_mod.init_simulation(cfg)
    assert s.cfg.max_atoms == 40      # 32 occupancy + 8 margin
    cfg = Config(doeam=True, nx=8, ny=8, nz=8, n_steps=0)
    s = sim_mod.init_simulation(cfg)
    assert s.cfg.max_atoms == 32
