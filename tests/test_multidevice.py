"""Multi-device domain decomposition vs. the serial oracle.

The reference established multi-rank correctness by running on real clusters
(SURVEY.md section 4); our substitute is an 8-virtual-device CPU mesh.  The
strongest check available: the sharded trajectory must match the serial one
(same physics, same initial state, different decomposition) to fp-reordering
tolerance, with zero atoms lost -- the reference's validateResult contract.
"""
import jax
import numpy as np
import pytest

from comd_tpu import Config, init_simulation

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def base_cfg(**kw):
    # 8x8x8 unit cells: global extent 28.92 A -> per-shard 14.46 A with
    # 2 shards/axis, >= 2 cells per axis at EAM cutoff 4.95+skin
    return Config(nx=8, ny=8, nz=8, temperature=600.0, dtype="float64",
                  max_atoms=48, box_chunk=64, pot_dir="pots", **kw)


def run_pair(n_steps=12, **kw):
    serial = init_simulation(base_cfg(**kw))
    sharded = init_simulation(base_cfg(xproc=2, yproc=2, zproc=2, **kw))
    assert type(sharded).__name__ == "ShardedSimulation"
    e0s, e0p = serial.e_potential, sharded.e_potential
    assert e0p == pytest.approx(e0s, abs=1e-9)
    serial.step_block(n_steps)
    sharded.step_block(n_steps)
    return serial, sharded


def test_initial_energy_matches_serial_lj():
    serial = init_simulation(base_cfg())
    sharded = init_simulation(base_cfg(xproc=2, yproc=2, zproc=2))
    assert sharded.sum_atoms() == serial.sum_atoms() == serial.n_global
    assert sharded.e_potential == pytest.approx(serial.e_potential, abs=1e-9)
    assert sharded.kinetic_energy() == pytest.approx(
        serial.kinetic_energy(), abs=1e-9)


def test_trajectory_matches_serial_lj():
    serial, sharded = run_pair()
    assert sharded.sum_atoms() == serial.n_global
    assert sharded.e_potential == pytest.approx(
        serial.e_potential, abs=1e-8)
    assert sharded.kinetic_energy() == pytest.approx(
        serial.kinetic_energy(), abs=1e-8)


def test_trajectory_matches_serial_eam():
    serial, sharded = run_pair(doeam=True)
    assert sharded.sum_atoms() == serial.n_global
    assert sharded.e_potential == pytest.approx(
        serial.e_potential, abs=1e-8)
    assert sharded.kinetic_energy() == pytest.approx(
        serial.kinetic_energy(), abs=1e-8)


def test_asymmetric_mesh():
    """2x1x1 decomposition (only one axis sharded)."""
    serial = init_simulation(base_cfg(doeam=True))
    sharded = init_simulation(base_cfg(doeam=True, xproc=2))
    sharded.step_block(6)
    serial.step_block(6)
    assert sharded.sum_atoms() == serial.n_global
    assert sharded.e_potential == pytest.approx(
        serial.e_potential, abs=1e-8)


def test_nl_sharded_matches_serial():
    """Sharded neighbor-list path vs serial NL path (EAM)."""
    serial = init_simulation(base_cfg(doeam=True, method="thread_atom_nl"))
    sharded = init_simulation(base_cfg(doeam=True, method="thread_atom_nl",
                                       xproc=2, yproc=2, zproc=2))
    assert sharded.e_potential == pytest.approx(serial.e_potential, abs=1e-9)
    serial.step_block(12)
    sharded.step_block(12)
    assert sharded.sum_atoms() == serial.n_global
    assert sharded.e_potential == pytest.approx(serial.e_potential, abs=1e-8)
    assert sharded.kinetic_energy() == pytest.approx(
        serial.kinetic_energy(), abs=1e-8)


def test_packed_halo_matches_full():
    """Count-packed atom halo messages (round-4): compacting the two send
    planes to a capped entry buffer + count must be BITWISE identical to
    shipping the full-capacity planes -- append_arrivals re-sorts arrivals
    by (box, gid), so packing order cannot leak into the trajectory.
    Eager stepping exchanges every step, exercising the pack maximally.
    Reference: on-GPU size scan, gpu_kernels.cu:684-690."""
    kw = dict(doeam=True, xproc=2, yproc=2, zproc=2, lazy_shell=False)
    full = init_simulation(base_cfg(halo_msg_factor=0.0, **kw))
    packed = init_simulation(base_cfg(halo_msg_factor=0.6, **kw))
    assert packed.e_potential == full.e_potential  # bitwise
    full.step_block(12)
    packed.step_block(12)
    assert packed.sum_atoms() == full.n_global
    assert not bool(np.any(packed.state.overflow))
    assert packed.e_potential == full.e_potential  # bitwise


def test_packed_halo_overflow_flag_fires():
    """An undersized message capacity must raise the sticky overflow flag
    (the abort path -- like a cell-capacity overflow), not silently drop
    atoms.  16^3 unit cells on 2x2x2 puts ~400 real atoms on each face's
    outer plane, well above the 256-entry capacity floor that a tiny
    halo_msg_factor clamps to."""
    sim = init_simulation(Config(
        nx=16, ny=16, nz=16, temperature=600.0, dtype="float32",
        max_atoms=48, box_chunk=64, pot_dir="pots",
        xproc=2, yproc=2, zproc=2, halo_msg_factor=1e-6))
    assert bool(np.any(np.asarray(sim.state.overflow)))
    # and the atoms that DID arrive are still a consistent state (no crash)
    assert np.isfinite(sim.e_potential)


@pytest.mark.fast
def test_plan_msg_capacity_arithmetic():
    """make_plan: cap = lane-rounded factor * two-plane slot count with a
    256-entry floor; atom_msg_bytes reports full vs packed traffic.
    Pure host-side arithmetic: build the shard geometry directly (the
    2x2x2-sharded 8^3-unit-cell domain of base_cfg) -- no sim init."""
    from comd_tpu import cells
    from comd_tpu.parallel import exchange
    geom = cells.make_geometry([0.0] * 3, [4 * 3.615] * 3, 5.445)
    plan = exchange.make_plan(geom, msg_factor=0.5, max_atoms=48)
    for ax in range(3):
        nmsg = len(plan.atom_send[ax][0])
        cap = plan.atom_cap[ax]
        assert cap % 128 == 0 and cap >= 256
        assert cap >= 0.5 * nmsg * 48 - 128
    rep = exchange.atom_msg_bytes(plan, 48, 4)
    assert rep["full_bytes"] > rep["packed_bytes"] > 0
    assert rep["ratio"] > 1.0
    with pytest.raises(ValueError):
        exchange.make_plan(geom, msg_factor=0.5, max_atoms=0)


def test_async_overlap_matches_sync():
    """-a 1 (interior/boundary split with overlap-enabling structure) must be
    bitwise identical to the sync path: the split changes scheduling freedom,
    not math."""
    sync = init_simulation(base_cfg(doeam=True, xproc=2, yproc=1, zproc=1))
    async_ = init_simulation(base_cfg(doeam=True, xproc=2, yproc=1, zproc=1,
                                      gpu_async=1))
    assert async_.e_potential == sync.e_potential
    sync.step_block(8)
    async_.step_block(8)
    assert async_.sum_atoms() == sync.n_global
    assert async_.e_potential == sync.e_potential  # bitwise


@pytest.mark.parametrize("doeam,pairlist", [(False, False), (True, False),
                                            (False, True)])
def test_async_nl_matches_sync(doeam, pairlist):
    """-a 1 on the NL methods (round-4): the interior/boundary ROW split
    (rows ordered interior-first at build, interior sweeps reading
    pre-exchange positions/dfEmbed) changes scheduling freedom, not math --
    the trajectory must match the sync NL path to fp-reordering tolerance
    across rebuild steps (which give up overlap like the lazy path).
    The -L pairlist case covers the same machinery reached via
    use_pairlist (it auto-defaults to -a 1 like the *_nl methods).
    Reference: timestep.c:257-265, :328-351."""
    kw = dict(doeam=doeam, xproc=2, yproc=2, zproc=2,
              **({"use_pairlist": True} if pairlist
                 else {"method": "thread_atom_nl"}))
    # pin -a 0 on the sync side: NL families auto-default to -a 1
    # (Config.resolved_gpu_async), which would make this comparison vacuous
    sync = init_simulation(base_cfg(gpu_async=0, **kw))
    async_ = init_simulation(base_cfg(gpu_async=1, **kw))
    assert async_.e_potential == pytest.approx(sync.e_potential, abs=1e-9)
    sync.step_block(30)
    async_.step_block(30)
    assert async_.sum_atoms() == sync.n_global
    assert async_.e_potential == pytest.approx(sync.e_potential, abs=1e-9)
    assert async_.kinetic_energy() == pytest.approx(
        sync.kinetic_energy(), abs=1e-9)


def test_async_lazy_exact_across_migrations():
    """-a 1 on the default lazy path must stay exact across rebuild steps
    that migrate atoms between shards: rebuild hands the interior sweep
    post-exchange positions (see sharded._shard_step_lazy.rebuild).  60
    steps at 600K with a tight skin forces several rebuilds+migrations."""
    kw = dict(doeam=True, xproc=2, yproc=1, zproc=1,
              relative_skin_distance=0.05)
    sync = init_simulation(base_cfg(**kw))
    async_ = init_simulation(base_cfg(gpu_async=1, **kw))
    sync.step_block(60)
    async_.step_block(60)
    assert async_.sum_atoms() == sync.n_global
    assert async_.e_potential == pytest.approx(sync.e_potential, abs=1e-9)


def test_async_eager_exact_across_migrations():
    """The EAGER (-a 1, lazy_shell=False) path exchanges atoms every step.
    On steps where any atom migrated ranks, interior sweeps are handed
    post-exchange positions (reference semantics: interior kernels run on
    post-redistribution cells, timestep.c:257-276), giving up the overlap
    for that step only -- so the async path is EXACT, not merely bounded,
    over a migration-rich window."""
    kw = dict(doeam=True, xproc=2, yproc=1, zproc=1, lazy_shell=False)
    sync = init_simulation(base_cfg(**kw))
    async_ = init_simulation(base_cfg(gpu_async=1, **kw))
    sync.step_block(60)
    async_.step_block(60)
    assert async_.sum_atoms() == sync.n_global
    assert async_.e_potential == pytest.approx(sync.e_potential, abs=1e-9)
    e_sync = sync.e_potential + sync.kinetic_energy()
    e_async = async_.e_potential + async_.kinetic_energy()
    assert e_async == pytest.approx(e_sync, abs=1e-9)


def test_energy_conservation_sharded():
    sharded = init_simulation(base_cfg(xproc=2, yproc=2, zproc=2, doeam=True))
    e0 = (sharded.e_potential + sharded.kinetic_energy()) / sharded.n_global
    sharded.step_block(20)
    e1 = (sharded.e_potential + sharded.kinetic_energy()) / sharded.n_global
    assert sharded.sum_atoms() == sharded.n_global
    assert abs(e1 - e0) < 2e-5 * abs(e0)


def test_lazy_energy_block_matches_full_sharded():
    """Sharded lazy-energy blocks (energy on last step only) are bitwise
    equal in trajectory and boundary energy to energy-every-step blocks."""
    a = init_simulation(base_cfg(doeam=True, xproc=2, yproc=2, zproc=2,
                                 energy_every_step=False))
    b = init_simulation(base_cfg(doeam=True, xproc=2, yproc=2, zproc=2,
                                 energy_every_step=True))
    a.step_block(6)
    b.step_block(6)
    assert float(a.state.e_potential) == float(b.state.e_potential)
    assert np.array_equal(np.asarray(a.state.r), np.asarray(b.state.r))
    assert np.array_equal(np.asarray(a.state.p), np.asarray(b.state.p))


def test_pallas_stencil_sharded_matches_serial():
    """-m cta_cell under the mesh: per-shard Pallas kernels (half-shell,
    interpret mode off-TPU) against the serial XLA oracle."""
    kw = dict(nx=8, ny=8, nz=8, temperature=600.0, dtype="float32",
              max_atoms=48, box_chunk=64, pot_dir="pots", doeam=True)
    serial = init_simulation(Config(interp_impl="cheb", **kw))
    sharded = init_simulation(Config(method="cta_cell", half_shell=True,
                                     xproc=2, yproc=2, zproc=2, **kw))
    assert sharded.e_potential == pytest.approx(serial.e_potential,
                                                rel=1e-6)
    serial.step_block(6)
    sharded.step_block(6)
    assert sharded.sum_atoms() == serial.n_global
    assert sharded.e_potential == pytest.approx(serial.e_potential,
                                                rel=1e-5)
