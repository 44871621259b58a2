"""The resolved EAM interpolation impl must reach make_evaluators on every
force path (VERDICT r1: the sharded sync path silently dropped it and fell
back to the 40x-slower 'rows' gathers)."""
import jax
import pytest

from comd_tpu import Config, init_simulation
from comd_tpu.ops import force_eam


@pytest.fixture
def record_impls(monkeypatch):
    calls = []
    orig = force_eam.make_evaluators

    def spy(pot, dtype, spline, impl="rows"):
        calls.append(impl)
        return orig(pot, dtype, spline, impl)

    monkeypatch.setattr(force_eam, "make_evaluators", spy)
    return calls


def cfg(**kw):
    return Config(nx=8, ny=8, nz=8, temperature=600.0, dtype="float32",
                  doeam=True, max_atoms=48, box_chunk=64, pot_dir="pots",
                  interp_impl="twolevel", **kw)


def test_serial_cell(record_impls):
    init_simulation(cfg())
    assert record_impls and all(i == "twolevel" for i in record_impls)


def test_serial_nl(record_impls):
    init_simulation(cfg(method="thread_atom_nl"))
    assert record_impls and all(i == "twolevel" for i in record_impls)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("gpu_async", [0, 1])
def test_sharded_cell(record_impls, gpu_async):
    init_simulation(cfg(xproc=2, yproc=2, zproc=2, gpu_async=gpu_async))
    assert record_impls and all(i == "twolevel" for i in record_impls)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_nl(record_impls):
    init_simulation(cfg(xproc=2, yproc=2, zproc=2, method="thread_atom_nl"))
    assert record_impls and all(i == "twolevel" for i in record_impls)
