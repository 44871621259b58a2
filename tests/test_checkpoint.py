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


def test_roundtrip_eam_nl(tmp_path):
    sim = init_simulation(base_cfg(doeam=True, method="thread_atom_nl"))
    sim.step_block(5)
    path = checkpoint.save(str(tmp_path / "ck"), sim, step=5)
    sim2, _ = checkpoint.load(path)
    sim.step_block(5)
    sim2.step_block(5)
    assert float(sim.state.e_potential) == pytest.approx(
        float(sim2.state.e_potential), abs=1e-12)
