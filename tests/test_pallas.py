"""Pallas cell-force kernel vs the XLA sweep (interpret mode on CPU)."""
import numpy as np
import pytest

from comd_tpu import Config, init_simulation


def base_cfg(**kw):
    return Config(nx=6, ny=6, nz=6, temperature=600.0, dtype="float64",
                  max_atoms=48, box_chunk=32, pot_dir="pots", **kw)


def test_cta_cell_matches_thread_atom():
    ref = init_simulation(base_cfg())
    pal = init_simulation(base_cfg(method="cta_cell"))
    assert pal.e_potential == pytest.approx(ref.e_potential, abs=1e-9)
    ref.step_block(6)
    pal.step_block(6)
    assert pal.sum_atoms() == ref.n_global
    assert pal.e_potential == pytest.approx(ref.e_potential, abs=1e-9)
    np.testing.assert_allclose(np.asarray(pal.state.p),
                               np.asarray(ref.state.p), atol=1e-10)
