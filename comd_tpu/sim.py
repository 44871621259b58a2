"""Simulation assembly and the jitted velocity-Verlet step.

Reference mapping:
  - SimFlat / SimGpu mirrored state  -> one SimState pytree of dense arrays
    (CoMDTypes.h:75-135, gpu_types.h:159-190)
  - initSimulation                   -> init_simulation (CoMD.c:200-327)
  - timestep velocity-Verlet loop    -> `step` closed over static geometry,
    run under jit + lax.scan (timestep.c:48-100)
  - redistributeAtoms + sortAtomsGpu -> ops.binning.rebucket
  - atom halo exchange               -> halo fill (serial) / mesh exchange
  - kineticEnergy / sumAtoms         -> fused reductions (timestep.c:109-133)

The step function is pure state->state: under jit the whole printRate block
runs on-device as one XLA program, which is the TPU analog of the reference
keeping the loop on-GPU with streams (SURVEY.md L5/L8).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import cells, lattice
from .config import Config
from .constants import KB_EV
from .ops import binning, force_lj, force_eam
from .ops import neighborlist as nlmod
from .potentials.eam import EamPotential, init_eam_pot
from .potentials.lj import LjPotential, init_lj_pot


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """Dense per-device cell state. B = nTotalBoxes, A = MAXATOMS capacity."""
    r: jax.Array          # [3, B, A] positions (halo cells hold PBC images)
    p: jax.Array          # [3, B, A] momenta
    f: jax.Array          # [3, B, A] forces (halo region zero)
    gid: jax.Array        # [B, A] int32, EMPTY_GID in unused slots
    n_atoms: jax.Array    # [B] int32
    e_potential: jax.Array  # f64 scalar
    n_local: jax.Array    # int32 scalar: current locally-owned atom count
    overflow: jax.Array   # bool scalar: any capacity overflow so far (cell
                          # capacity or NL K; reference device-asserts
                          # instead, gpu_redistribute.h:152)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NLSimState:
    """SimState + Verlet neighbor list (the *_nl method carry)."""
    sim: SimState
    nlist: nlmod.NeighborList


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LazySimState:
    """SimState + rebucket-time position snapshot (lazy-shell cell methods)."""
    sim: SimState
    last_r: jax.Array    # [3, B, A]


@dataclasses.dataclass
class Simulation:
    """Host-side handle: static params + device state + compiled step."""
    cfg: Config
    pot: object                      # LjPotential | EamPotential
    geom: cells.CellGeometry
    global_extent: np.ndarray        # [3]
    n_global: int
    state: SimState
    lattice_const: float
    skin_eff: Optional[float] = None   # resolved trigger skin (plan_cells);
                                       # None -> cutoff * -S (legacy)

    def __post_init__(self):
        self._step_block = {}
        self.nlist = None

    @property
    def mass(self) -> float:
        return self.pot.mass

    @property
    def uses_nl(self) -> bool:
        """*_nl methods and the LJ pairlist (-L) run on Verlet lists."""
        return self.cfg.use_nl or self.cfg.use_pairlist

    @property
    def uses_lazy(self) -> bool:
        """Cell methods with a skin shell: rebucket on the skin/2 trigger."""
        return (not self.uses_nl and self.cfg.lazy_shell
                and self.cfg.relative_skin_distance > 0)

    @property
    def skin(self) -> float:
        if not (self.uses_nl or self.uses_lazy):
            return 0.0
        if self.skin_eff is not None:
            return self.skin_eff
        return self.pot.cutoff * self.cfg.relative_skin_distance

    # ---------------- force + energy ----------------

    def _force_fn(self, want_energy: bool = True):
        """Build the force closure; ``want_energy=False`` builds the
        dynamics-only variant (identical forces, no energy terms) used for
        the steps between reporting boundaries -- the reporting cost then
        amortizes over printRate like the reference's printThings cadence.
        Only the -I table-interpolated LJ path lacks the skip and always
        computes energy; the pallas paths honor want_energy."""
        cfg, geom, pot = self.cfg, self.geom, self.pot
        e_dtype = cfg.jax_energy_dtype
        chunk = cfg.resolved_box_chunk

        use_pallas = cfg.method == "cta_cell" and not cfg.lj_interpolation
        use_half = cfg.half_shell and not use_pallas and not cfg.lj_interpolation
        pallas_half = use_pallas and cfg.half_shell
        # interpret mode only off-TPU (tests); on TPU the kernel is real --
        # any Mosaic rejection is a loud error, never a silent fallback.
        interpret = jax.default_backend() != "tpu"
        from .ops.sweep import fold_halo_serial
        fold = functools.partial(fold_halo_serial, geom)

        if isinstance(pot, EamPotential):
            def force(r, n_atoms):
                def fill(x, rhobar_l=None):
                    return binning.fill_halo_scalar_serial(geom, x)
                if use_pallas:
                    f_loc, u_raw, _dfe = force_eam.eam_force_pallas(
                        geom, pot, r, fill, chunk=chunk, e_dtype=e_dtype,
                        interpret=interpret, want_energy=want_energy,
                        half=pallas_half, fold=fold)
                elif use_half:
                    f_loc, u_raw, _dfe = force_eam.eam_force_half(
                        geom, pot, r, fill, fold, spline=cfg.spline,
                        chunk=chunk, e_dtype=e_dtype,
                        interp_impl=cfg.resolved_interp_impl,
                        want_energy=want_energy, fetch=cfg.half_fetch,
                        materialize=cfg.half_materialize)
                else:
                    f_loc, u_raw, _dfe = force_eam.eam_force(
                        geom, pot, r, fill, spline=cfg.spline, chunk=chunk,
                        e_dtype=e_dtype,
                        interp_impl=cfg.resolved_interp_impl,
                        want_energy=want_energy,
                        sweep_impl=cfg.resolved_sweep_impl)
                if u_raw is None:
                    return f_loc, None, None
                A = r.shape[-1]
                slot = jax.lax.broadcasted_iota(
                    jnp.int32, (geom.n_local, A), 1)
                valid = slot < n_atoms[:geom.n_local, None]
                u, e_pot = force_eam.finalize_eam_energy(u_raw, valid, e_dtype)
                return f_loc, u, e_pot
        elif use_pallas:
            from .ops.pallas.stencil import (lj_force_stencil,
                                             lj_force_stencil_half)

            def force(r, n_atoms):
                if pallas_half:
                    return lj_force_stencil_half(
                        geom, pot, r, fold, chunk=chunk, e_dtype=e_dtype,
                        interpret=interpret, want_energy=want_energy)
                return lj_force_stencil(geom, pot, r, chunk=chunk,
                                        e_dtype=e_dtype, interpret=interpret,
                                        want_energy=want_energy)
        elif use_half:
            def force(r, n_atoms):
                return force_lj.lj_force_half(
                    geom, pot, r, fold, chunk=chunk, e_dtype=e_dtype,
                    want_energy=want_energy, fetch=cfg.half_fetch,
                    materialize=cfg.half_materialize)
        elif cfg.lj_interpolation:
            def force(r, n_atoms):
                return force_lj.lj_force_interp(geom, pot, r, chunk=chunk,
                                                e_dtype=e_dtype)
        else:
            def force(r, n_atoms):
                return force_lj.lj_force(geom, pot, r, chunk=chunk,
                                         e_dtype=e_dtype,
                                         want_energy=want_energy,
                                         sweep_impl=cfg.resolved_sweep_impl)
        return force

    def _make_step(self, want_energy: bool = True):
        cfg, geom = self.cfg, self.geom
        dt = cfg.dt
        inv_mass = 1.0 / self.mass
        force = self._force_fn(want_energy)
        extent = self.global_extent
        n_local_boxes = geom.n_local

        def half_kick(p, f):
            return p + p.dtype.type(0.5 * dt) * f

        def step(state: SimState, _):
            # velocity half kick with forces from the previous step
            with jax.named_scope("velocity"):
                p = half_kick(state.p, state.f)
            with jax.named_scope("position"):
                r = state.r + r_dt(p)
            # redistribute: canonical (cell,gid) rebucket + PBC wrap
            with jax.named_scope("redistribute"):
                r_l, p_l, gid, n_atoms, _nmig, ovf = binning.rebucket(
                    geom, r, p, state.gid, state.n_atoms, wrap_extent=extent)
                # halo fill (serial periodic images)
                r_full, gid, n_atoms = binning.fill_halo_serial(
                    geom, r_l, gid, n_atoms)
            # forces
            with jax.named_scope("force"):
                f_loc, _u, e_pot = force(r_full, n_atoms)
            if e_pot is None:
                e_pot = state.e_potential
            f = jnp.zeros_like(state.f).at[:, :n_local_boxes].set(
                f_loc.astype(state.f.dtype))
            # second half kick
            p = half_kick(p_l, f)
            n_local = jnp.sum(n_atoms[:n_local_boxes]).astype(jnp.int32)
            new_state = SimState(r=r_full, p=p, f=f, gid=gid, n_atoms=n_atoms,
                                 e_potential=e_pot, n_local=n_local,
                                 overflow=state.overflow | ovf)
            return new_state, ()

        def r_dt(p):
            return p * p.dtype.type(dt * inv_mass)

        return step

    # ---------------- neighbor-list (_nl) machinery ----------------

    def _force_fn_nl(self, want_energy: bool = True):
        cfg, pot = self.cfg, self.pot
        e_dtype = cfg.jax_energy_dtype
        chunk = cfg.nl_chunk
        geom = self.geom

        if isinstance(pot, EamPotential):
            def force(nlist, r, n_atoms):
                def fill(x, rhobar_l=None):
                    return binning.fill_halo_scalar_serial(geom, x)
                f_full, e_pot, _dfe = force_eam.eam_force_nl(
                    nlist, pot, r, fill, spline=cfg.spline, chunk=chunk,
                    e_dtype=e_dtype, interp_impl=cfg.resolved_interp_impl,
                    want_energy=want_energy)
                return f_full, e_pot
        else:
            def force(nlist, r, n_atoms):
                f_full, _u, e_pot = force_lj.lj_force_nl(
                    nlist, pot, r, chunk=chunk, e_dtype=e_dtype,
                    want_energy=want_energy)
                return f_full, e_pot
        return force

    def _nl_build_params(self):
        cfg = self.cfg
        rcut_nl = self.pot.cutoff + self.skin
        n_rows = nlmod.n_rows_for(self.geom, cfg.max_atoms,
                                  cfg.nl_rows_factor)
        if cfg.nl_max_neighbors > 0:
            k = cfg.nl_max_neighbors
        else:
            # auto-size: 1.4x the mean neighbor count in the rcut+skin
            # sphere, rounded up to a lane multiple
            density = self.n_global / float(np.prod(self.global_extent))
            mean_nbrs = density * 4.0 / 3.0 * np.pi * rcut_nl ** 3
            k = int(-(-1.4 * mean_nbrs // 32) * 32)
        return dict(k=k, rcut2=rcut_nl ** 2, n_rows=n_rows,
                    chunk=cfg.nl_chunk)

    def build_neighbor_list(self) -> None:
        params = self._nl_build_params()

        @jax.jit
        def build(state: SimState):
            nl, ovf = nlmod.build(self.geom, state.r, state.n_atoms, **params)
            # surface an undersized-K truncation at t=0 (a short run would
            # otherwise never hit the skin-triggered rebuild that flags it)
            return nl, dataclasses.replace(state,
                                           overflow=state.overflow | ovf)

        self.nlist, self.state = build(self.state)

    def _make_step_nl(self, want_energy: bool = True):
        cfg, geom = self.cfg, self.geom
        dt = cfg.dt
        inv_mass = 1.0 / self.mass
        force = self._force_fn_nl(want_energy)
        ext = self.global_extent
        skin = self.skin
        params = self._nl_build_params()
        n_local_boxes = geom.n_local

        def rebuild(args):
            r, p, gid, n_atoms, _nl = args
            r_l, p_l, gid2, n2, _nm, ovf = binning.rebucket(
                geom, r, p, gid, n_atoms, wrap_extent=ext)
            r2, gid2, n2 = binning.fill_halo_serial(geom, r_l, gid2, n2)
            nl, ovf2 = nlmod.build(geom, r2, n2, **params)
            return r2, p_l, gid2, n2, nl, ovf | ovf2

        def refresh(args):
            r, p, gid, n_atoms, nl = args
            src = jnp.asarray(geom.halo_src)
            shift = jnp.asarray(geom.halo_shift, dtype=r.dtype)
            r = r.at[:, n_local_boxes:].set(r[:, src] + shift.T[:, :, None])
            return r, p, gid, n_atoms, nl, jnp.zeros((), jnp.bool_)

        def step(c: NLSimState, _):
            s, nl = c.sim, c.nlist
            p = s.p + s.p.dtype.type(0.5 * dt) * s.f
            r = s.r + p * p.dtype.type(dt * inv_mass)
            dirty = nlmod.needs_rebuild(nl, r, n_local_boxes, skin)
            r, p, gid, n_atoms, nl, ovf = jax.lax.cond(
                dirty, rebuild, refresh, (r, p, s.gid, s.n_atoms, nl))
            f, e_pot = force(nl, r, n_atoms)
            if e_pot is None:
                e_pot = s.e_potential
            f = f.astype(s.f.dtype)
            p = p + p.dtype.type(0.5 * dt) * f
            n_local = jnp.sum(n_atoms[:n_local_boxes]).astype(jnp.int32)
            return NLSimState(
                sim=SimState(r=r, p=p, f=f, gid=gid, n_atoms=n_atoms,
                             e_potential=e_pot, n_local=n_local,
                             overflow=s.overflow | ovf),
                nlist=nl), ()

        return step

    # ---------------- lazy-shell cell stepping ----------------

    def _make_step_lazy(self, want_energy: bool = True):
        """Cell-sweep step with the skin/2 rebucket trigger: the dense
        redistribution (sort + scatter + halo rebuild) runs only when some
        atom moved skin/2 since the last rebucket; other steps just refresh
        ghost positions.  Amortizes the reference's every-step
        redistributeAtoms (timestep.c:69) over ~skin/(2*v*dt) steps."""
        cfg, geom = self.cfg, self.geom
        dt = cfg.dt
        inv_mass = 1.0 / self.mass
        force = self._force_fn(want_energy)
        ext = self.global_extent
        skin = self.skin
        n_local_boxes = geom.n_local

        def rebuild(args):
            r, p, gid, n_atoms, _last = args
            r_l, p_l, gid2, n2, _nm, ovf = binning.rebucket(
                geom, r, p, gid, n_atoms, wrap_extent=ext)
            r2, gid2, n2 = binning.fill_halo_serial(geom, r_l, gid2, n2)
            return r2, p_l, gid2, n2, r2, ovf

        def refresh(args):
            r, p, gid, n_atoms, last_r = args
            src = jnp.asarray(geom.halo_src)
            shift = jnp.asarray(geom.halo_shift, dtype=r.dtype)
            r = r.at[:, n_local_boxes:].set(r[:, src] + shift.T[:, :, None])
            return r, p, gid, n_atoms, last_r, jnp.zeros((), jnp.bool_)

        def step(c: LazySimState, _):
            s = c.sim
            with jax.named_scope("velocity"):
                p = s.p + s.p.dtype.type(0.5 * dt) * s.f
            with jax.named_scope("position"):
                r = s.r + p * p.dtype.type(dt * inv_mass)
            with jax.named_scope("redistribute"):
                dirty = nlmod.needs_rebuild(c.last_r, r, n_local_boxes, skin)
                r, p, gid, n_atoms, last_r, ovf = jax.lax.cond(
                    dirty, rebuild, refresh,
                    (r, p, s.gid, s.n_atoms, c.last_r))
            with jax.named_scope("force"):
                f_loc, _u, e_pot = force(r, n_atoms)
            if e_pot is None:
                e_pot = s.e_potential
            f = jnp.zeros_like(s.f).at[:, :n_local_boxes].set(
                f_loc.astype(s.f.dtype))
            p = p + p.dtype.type(0.5 * dt) * f
            n_local = jnp.sum(n_atoms[:n_local_boxes]).astype(jnp.int32)
            return LazySimState(
                sim=SimState(r=r, p=p, f=f, gid=gid, n_atoms=n_atoms,
                             e_potential=e_pot, n_local=n_local,
                             overflow=s.overflow | ovf),
                last_r=last_r), ()

        return step

    # ---------------- stepping ----------------

    def step_block(self, n_steps: int) -> None:
        """Run n_steps of velocity-Verlet as one jitted lax.scan.

        Forces (the dynamics) are identical every step; the energy terms are
        computed only on the LAST step of the block -- the block boundary IS
        the reporting boundary (the reference likewise only consumes energy
        every printRate steps, CoMD.c:146-162).  ``-e`` semantics unchanged:
        ``sim.e_potential`` is exact at every block boundary.
        """
        if n_steps not in self._step_block:
            make = (self._make_step_nl if self.uses_nl else
                    self._make_step_lazy if self.uses_lazy else
                    self._make_step)
            step_full = make(want_energy=True)
            if n_steps == 1 or self.cfg.energy_every_step:
                @jax.jit
                def block(carry):
                    carry, _ = jax.lax.scan(step_full, carry, None,
                                            length=n_steps)
                    return carry
            else:
                step_fast = make(want_energy=False)

                @jax.jit
                def block(carry):
                    carry, _ = jax.lax.scan(step_fast, carry, None,
                                            length=n_steps - 1)
                    carry, _ = step_full(carry, None)
                    return carry

            self._step_block[n_steps] = block
        if self.uses_nl:
            out = self._step_block[n_steps](
                NLSimState(sim=self.state, nlist=self.nlist))
            self.state, self.nlist = out.sim, out.nlist
        elif self.uses_lazy:
            if getattr(self, "last_r", None) is None:
                self.last_r = self.state.r
            out = self._step_block[n_steps](
                LazySimState(sim=self.state, last_r=self.last_r))
            self.state, self.last_r = out.sim, out.last_r
        else:
            self.state = self._step_block[n_steps](self.state)

    def compute_force(self) -> None:
        """Force-only evaluation (used at init; CoMD.c:314)."""
        if self.uses_nl:
            force_nl = self._force_fn_nl()

            @jax.jit
            def eval_force_nl(state: SimState, nlist):
                f, e_pot = force_nl(nlist, state.r, state.n_atoms)
                return dataclasses.replace(
                    state, f=f.astype(state.f.dtype), e_potential=e_pot)

            self.state = eval_force_nl(self.state, self.nlist)
            return
        force = self._force_fn()

        @jax.jit
        def eval_force(state: SimState):
            f_loc, _u, e_pot = force(state.r, state.n_atoms)
            f = jnp.zeros_like(state.f).at[:, :self.geom.n_local].set(
                f_loc.astype(state.f.dtype))
            return dataclasses.replace(state, f=f, e_potential=e_pot)

        self.state = eval_force(self.state)

    def kinetic_energy(self) -> float:
        """eKinetic = sum p^2/2m over local atoms (timestep.c:109-133)."""
        p = self.state.p[:, :self.geom.n_local]
        e = 0.5 * jnp.sum(
            jnp.asarray(p, self.cfg.jax_energy_dtype) ** 2) / self.mass
        return float(e)

    @property
    def e_potential(self) -> float:
        return float(self.state.e_potential)

    def sum_atoms(self) -> int:
        return int(jnp.sum(self.state.n_atoms[:self.geom.n_local]))

    def temperature(self) -> float:
        return self.kinetic_energy() / self.n_global / KB_EV / 1.5

    def max_occupancy(self) -> int:
        return int(jnp.max(self.state.n_atoms[:self.geom.n_local]))

    def occupancy_histogram(self) -> np.ndarray:
        counts = np.asarray(self.state.n_atoms)[:self.geom.n_local]
        return np.bincount(counts, minlength=self.cfg.max_atoms + 1)


def init_potential(cfg: Config):
    if cfg.doeam:
        return init_eam_pot(cfg.pot_dir, cfg.pot_name, cfg.pot_type)
    return init_lj_pot(cfg.lj_cutoff_factor)


def _tscope(timers, name: str):
    """Timer scope when ``timers`` is given, else a no-op (the init-phase
    dispatches are the reference's initSimulation timer fills)."""
    import contextlib
    return timers.scope(name) if timers is not None else \
        contextlib.nullcontext()


def init_simulation(cfg: Config, timers=None):
    """Build the initial state (initSimulation, CoMD.c:200-327).

    With -i/-j/-k > 1 this dispatches to the mesh-sharded implementation
    (spatial domain decomposition over devices, the reference's MPI grid).

    ``timers`` (utils.timers.PerfTimers) times the separately-dispatched
    init phases -- initial redistribute/halo, NL build, first force -- the
    real dispatches behind the reference's redistribute/neighborList/force
    timer rows (CoMD.c:303-318).  In-loop phases fuse into one XLA program
    per block; per-phase attribution there needs -s (utils.profile)."""
    cfg = cfg.resolve()
    if cfg.nprocs > 1:
        from .parallel.sharded import init_sharded_simulation
        return init_sharded_simulation(cfg, timers=timers)
    pot = init_potential(cfg)

    lat = cfg.lat if cfg.lat > 0 else pot.lat
    global_extent = np.array([cfg.nx, cfg.ny, cfg.nz], np.float64) * lat

    # --- host-side scene generation (numpy, reference-exact) ---
    r, gid = lattice.create_fcc_lattice(
        cfg.nx, cfg.ny, cfg.nz, lat, np.zeros(3), global_extent)
    n_global = 4 * cfg.nx * cfg.ny * cfg.nz
    assert r.shape[0] == n_global, (r.shape, n_global)
    p = lattice.set_temperature(gid, pot.mass, cfg.temperature, n_global)
    r = lattice.random_displacements(r, gid, cfg.initial_delta)

    cfg, geom, plan = plan_geometry(
        cfg, pot, lat, r, (cfg.nx, cfg.ny, cfg.nz), (1, 1, 1),
        np.zeros(3), global_extent)

    state = bin_atoms_host(geom, cfg, r, p, gid)
    sim = Simulation(cfg=cfg, pot=pot, geom=geom,
                     global_extent=global_extent, n_global=n_global,
                     state=state, lattice_const=lat, skin_eff=plan.skin)

    # fill halo + (NL build) + first force (CoMD.c:303-318)
    with _tscope(timers, "redistribute"), _tscope(timers, "atomHalo"):
        sim.state = jax.block_until_ready(_initial_halo(sim))
    if sim.uses_nl:
        with _tscope(timers, "neighborList"):
            sim.build_neighbor_list()
            jax.block_until_ready(sim.nlist)
    with _tscope(timers, "force"):
        sim.compute_force()
        sim.state.f.block_until_ready()
    return sim


def plan_geometry(cfg: Config, pot, lat: float, r_global: np.ndarray,
                  n_cells, proc_grid, local_min, local_max,
                  n_atoms_total=None, stat_reduce=None):
    """Resolve cell sizing + capacity (cells.plan_cells) and build the local
    CellGeometry.  Returns (cfg', geom, plan) with cfg' carrying the
    *resolved* max_atoms and cell_mode so downstream consumers (checkpoint
    restore, CLI messages, NL sizing) see concrete values.

    NL / pairlist methods keep the classic sizing and the requested -S skin
    (a larger trigger skin would inflate the Verlet K); cell-sweep methods
    use the full cell slack min(cell) - cutoff as the rebucket trigger."""
    uses_nl = cfg.use_nl or cfg.use_pairlist
    lazy = (not uses_nl and cfg.lazy_shell
            and cfg.relative_skin_distance > 0)
    use_skin = uses_nl or lazy
    skin_req = pot.cutoff * cfg.relative_skin_distance if use_skin else 0.0

    # auto-capacity margin: the commensurate occupancy-stability argument
    # (0.25*lat face margin >> thermal rms) holds for solids; near/above
    # melting (Cu T_m = 1358 K) or under large -r jitter occupancy can
    # drift, so pad the auto capacity -- the in-program overflow flag
    # still aborts loudly if even that is exceeded
    margin = 8 if (cfg.temperature > 1200.0
                   or cfg.initial_delta > 0.3) else 0
    plan = cells.plan_cells(
        cutoff=pot.cutoff, lat=lat, n_cells=n_cells, proc_grid=proc_grid,
        r_global=r_global, skin_req=skin_req, lazy=lazy,
        mode="classic" if uses_nl else cfg.cell_mode,
        max_atoms=cfg.max_atoms, trigger_from_cell=not uses_nl,
        n_atoms_total=n_atoms_total, stat_reduce=stat_reduce,
        margin_slots=margin)
    cfg = dataclasses.replace(cfg, max_atoms=plan.max_atoms,
                              cell_mode=plan.mode)
    geom = cells.make_geometry(
        np.asarray(local_min, np.float64), np.asarray(local_max, np.float64),
        pot.cutoff + (plan.skin if use_skin else 0.0),
        use_hilbert=cfg.do_hilbert, cell_size=plan.cell_size)
    return cfg, geom, plan


def bin_atoms_host_np(geom: cells.CellGeometry, cfg: Config,
                      r: np.ndarray, p: np.ndarray,
                      gid: np.ndarray) -> dict:
    """Host binning of generated atoms into the dense cell layout.

    Returns a dict of NUMPY arrays (one shard's block) so multi-host init
    can feed jax.make_array_from_callback without device round-trips."""
    A = cfg.max_atoms
    B = geom.n_total
    dtype = np.dtype(cfg.dtype)

    box = cells.box_from_coord(geom, r)
    assert box.max() < geom.n_local, "generated atom outside local domain"
    order = np.lexsort((gid, box))
    box_s = box[order]
    counts = np.bincount(box_s, minlength=B).astype(np.int32)
    if counts.max() > A:
        raise ValueError(
            f"cell occupancy {counts.max()} exceeds capacity {A}; "
            f"increase Config.max_atoms")
    starts = np.zeros(B, np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    rank = np.arange(len(box_s)) - starts[box_s]
    dest = box_s.astype(np.int64) * A + rank

    r_arr = np.full((3, B * A), binning.EMPTY_POS, dtype=dtype)
    p_arr = np.zeros((3, B * A), dtype=dtype)
    gid_arr = np.full((B * A,), binning.EMPTY_GID, dtype=np.int32)
    for a in range(3):
        r_arr[a, dest] = r[order, a]
        p_arr[a, dest] = p[order, a]
    gid_arr[dest] = gid[order]

    return dict(
        r=r_arr.reshape(3, B, A),
        p=p_arr.reshape(3, B, A),
        f=np.zeros((3, B, A), dtype=dtype),
        gid=gid_arr.reshape(B, A),
        n_atoms=counts,
    )


def bin_atoms_host(geom: cells.CellGeometry, cfg: Config,
                   r: np.ndarray, p: np.ndarray, gid: np.ndarray) -> SimState:
    """Host binning of generated atoms into a device SimState (serial)."""
    d = bin_atoms_host_np(geom, cfg, r, p, gid)
    e_dtype = np.dtype(cfg.energy_dtype)
    return SimState(
        r=jnp.asarray(d["r"]),
        p=jnp.asarray(d["p"]),
        f=jnp.asarray(d["f"]),
        gid=jnp.asarray(d["gid"]),
        n_atoms=jnp.asarray(d["n_atoms"]),
        e_potential=jnp.zeros((), dtype=e_dtype),
        n_local=jnp.asarray(len(gid), jnp.int32),
        overflow=jnp.zeros((), jnp.bool_),
    )


def _initial_halo(sim: Simulation) -> SimState:
    geom = sim.geom

    @jax.jit
    def fill(state: SimState):
        r, gid, n_atoms = binning.fill_halo_serial(
            geom, state.r, state.gid, state.n_atoms)
        return dataclasses.replace(state, r=r, gid=gid, n_atoms=n_atoms)

    return fill(sim.state)
