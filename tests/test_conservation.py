"""Energy / particle conservation over dynamics (validateResult,
src-mpi/CoMD.c:395-440): the de-facto integration test of the reference.

Also the race detector: with canonical (cell,gid) ordering the trajectory is
bitwise reproducible, the property the reference checks by eye
(CoMD.c:947-958).
"""
import jax
import pytest

from comd_tpu import Config, init_simulation


def run(cfg: Config, n_steps=60, block=20):
    sim = init_simulation(cfg)
    e0 = (sim.e_potential + sim.kinetic_energy()) / sim.n_global
    for _ in range(n_steps // block):
        sim.step_block(block)
        assert sim.sum_atoms() == sim.n_global, "atoms lost"
    e1 = (sim.e_potential + sim.kinetic_energy()) / sim.n_global
    return sim, e0, e1


def base_cfg(**kw) -> Config:
    return Config(nx=6, ny=6, nz=6, temperature=600.0, dtype="float64",
                  max_atoms=40, box_chunk=32, pot_dir="pots", **kw)


def test_lj_energy_conservation():
    _, e0, e1 = run(base_cfg())
    assert abs(e1 - e0) < 5e-5 * abs(e0)


def test_eam_energy_conservation():
    _, e0, e1 = run(base_cfg(doeam=True))
    assert abs(e1 - e0) < 2e-5 * abs(e0)


def test_f32_tracks_f64():
    cfg64 = base_cfg()
    cfg32 = base_cfg()
    cfg32.dtype = "float32"
    _, _, e64 = run(cfg64, n_steps=20)
    _, _, e32 = run(cfg32, n_steps=20)
    assert e32 == pytest.approx(e64, abs=5e-5)


def test_bitwise_reproducible():
    """Same config twice -> bitwise identical energy (race detector)."""
    _, _, a = run(base_cfg(), n_steps=20)
    _, _, b = run(base_cfg(), n_steps=20)
    assert a == b


def test_momentum_conserved():
    """Newton's third law through the full step machinery (27-cell sweep,
    redistribution, PBC wraps): total momentum stays at its initial value
    (~0 after the v_cm removal of initAtoms.c:141-160) to f64 roundoff."""
    import jax.numpy as jnp
    sim, _, _ = run(base_cfg(doeam=True), n_steps=40, block=20)
    p = jnp.asarray(sim.state.p[:, :sim.geom.n_local], jnp.float64)
    drift = float(jnp.max(jnp.abs(jnp.sum(p, axis=(1, 2)))))
    scale = float(jnp.sum(jnp.abs(p))) / 3.0
    assert drift < 1e-11 * scale, (drift, scale)


def test_temperature_init_exact():
    """setTemperature rescales to the exact target (initAtoms.c:183-195)."""
    sim = init_simulation(base_cfg())
    assert sim.temperature() == pytest.approx(600.0, rel=1e-12)
