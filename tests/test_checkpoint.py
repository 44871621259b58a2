"""Checkpoint/resume: restart must continue the trajectory exactly."""
import numpy as np
import pytest

from comd_tpu import Config, init_simulation
from comd_tpu.utils import checkpoint


def base_cfg(**kw):
    return Config(nx=4, ny=4, nz=4, temperature=600.0, dtype="float64",
                  max_atoms=48, box_chunk=32, pot_dir="pots", **kw)


def test_roundtrip_bitexact(tmp_path):
    sim = init_simulation(base_cfg())
    sim.step_block(10)
    path = checkpoint.save(str(tmp_path / "ck"), sim, step=10)

    sim2, step = checkpoint.load(path)
    assert step == 10
    np.testing.assert_array_equal(np.asarray(sim2.state.r),
                                  np.asarray(sim.state.r))
    np.testing.assert_array_equal(np.asarray(sim2.state.p),
                                  np.asarray(sim.state.p))

    # continuing from the restart matches continuing the original bitwise
    sim.step_block(10)
    sim2.step_block(10)
    assert float(sim.state.e_potential) == float(sim2.state.e_potential)
    np.testing.assert_array_equal(np.asarray(sim2.state.r),
                                  np.asarray(sim.state.r))


def test_lazy_baseline_persisted(tmp_path):
    """The lazy-shell rebucket baseline (last_r) must survive the restart:
    seeding it from restored (already-drifted) positions would permit a full
    skin of drift before the next rebuild."""
    sim = init_simulation(base_cfg())
    assert sim.uses_lazy
    sim.step_block(25)   # long enough to accumulate drift from last rebucket
    drift = np.max(np.abs(np.asarray(sim.state.r[:, :sim.geom.n_local])
                          - np.asarray(sim.last_r[:, :sim.geom.n_local])))
    assert drift > 0.0
    path = checkpoint.save(str(tmp_path / "ck"), sim, step=25)
    sim2, _ = checkpoint.load(path)
    np.testing.assert_array_equal(np.asarray(sim2.last_r),
                                  np.asarray(sim.last_r))
    sim.step_block(25)
    sim2.step_block(25)
    np.testing.assert_array_equal(np.asarray(sim2.state.r),
                                  np.asarray(sim.state.r))


def test_sharded_restore(tmp_path):
    """Sharded save/restore: state arrives back with the mesh sharding and
    the trajectory continues identically to the uninterrupted sharded run."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = Config(nx=8, ny=8, nz=8, temperature=600.0, dtype="float64",
                 max_atoms=48, box_chunk=64, pot_dir="pots",
                 xproc=2, yproc=2, zproc=2)
    sim = init_simulation(cfg)
    sim.step_block(6)
    path = checkpoint.save(str(tmp_path / "ck"), sim, step=6)
    sim2, step = checkpoint.load(path)
    assert step == 6
    # restored arrays must be sharded over the mesh, not single-device
    assert len(sim2.state.r.sharding.device_set) == 8
    sim.step_block(6)
    sim2.step_block(6)
    assert float(sim2.e_potential) == pytest.approx(
        float(sim.e_potential), abs=1e-12)
    np.testing.assert_array_equal(np.asarray(sim2.state.r),
                                  np.asarray(sim.state.r))


def test_roundtrip_eam_nl(tmp_path):
    sim = init_simulation(base_cfg(doeam=True, method="thread_atom_nl"))
    sim.step_block(5)
    path = checkpoint.save(str(tmp_path / "ck"), sim, step=5)
    sim2, _ = checkpoint.load(path)
    sim.step_block(5)
    sim2.step_block(5)
    assert float(sim.state.e_potential) == pytest.approx(
        float(sim2.state.e_potential), abs=1e-12)
