"""Multi-device simulation: spatial domain decomposition over a 3D mesh.

The reference's MPI rank grid (initDecomposition, src-mpi/decomposition.c) a
becomes a `jax.sharding.Mesh` with axes ('x','y','z'); each device owns one
spatial brick in its own local coordinate frame.  The whole step -- kick,
drift, rebucket, 3-stage atom exchange, force (with the EAM mid-force
dfEmbed exchange), kick -- runs as ONE shard_map-ped XLA program per
print-rate block, so collectives are overlapped with independent compute by
the XLA scheduler: the reference's GPUDirect-Async capability (-a 1,
eam.c:196-264) is a scheduling property here, not a transport.

State arrays carry a leading [Px, Py, Pz] mesh index sharded over the mesh;
inside shard_map every block is the per-shard dense cell state.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import cells, lattice
from ..config import Config
from ..constants import KB_EV
from ..ops import binning, force_lj, force_eam
from ..ops import neighborlist as nlmod
from ..potentials.eam import EamPotential
from . import exchange
from ..sim import (SimState, NLSimState, LazySimState, bin_atoms_host_np,
                   init_potential, plan_geometry)


def _strip(state):
    """Drop the [1,1,1] leading block dims of mesh-sharded array leaves;
    replicated scalars (e_potential, n_local) pass through."""
    def fix(x):
        if hasattr(x, "ndim") and x.ndim >= 3 and x.shape[:3] == (1, 1, 1):
            return x[0, 0, 0]
        return x
    return jax.tree.map(fix, state)


def _expand(state, scalar_names=("e_potential", "n_local", "overflow")):
    """Re-add [1,1,1] leading dims on non-scalar leaves."""
    def walk(obj):
        if dataclasses.is_dataclass(obj):
            return type(obj)(**{
                f.name: (getattr(obj, f.name)
                         if f.name in scalar_names
                         else walk(getattr(obj, f.name)))
                for f in dataclasses.fields(obj)})
        return obj[None, None, None]
    return walk(state)


def make_mesh(px: int, py: int, pz: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = px * py * pz
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.array(devices[:n]).reshape(px, py, pz)
    return Mesh(dev, ("x", "y", "z"))


@dataclasses.dataclass
class ShardedSimulation:
    """Same interface as sim.Simulation, over a device mesh."""
    cfg: Config
    pot: object
    geom: cells.CellGeometry          # per-shard geometry (local frame)
    plan: exchange.ExchangePlan
    mesh: Mesh
    global_extent: np.ndarray
    n_global: int
    state: SimState                   # leading dims [Px, Py, Pz]
    lattice_const: float
    skin_eff: float | None = None     # resolved trigger skin (plan_cells)

    def __post_init__(self):
        self._step_block = {}
        self._spec = P("x", "y", "z")

    @property
    def mass(self) -> float:
        return self.pot.mass

    @property
    def proc_grid(self):
        return tuple(self.mesh.devices.shape)

    @property
    def uses_nl(self) -> bool:
        return self.cfg.use_nl or self.cfg.use_pairlist

    @property
    def uses_lazy(self) -> bool:
        return (not self.uses_nl and self.cfg.lazy_shell
                and self.cfg.relative_skin_distance > 0)

    @property
    def skin(self) -> float:
        if not (self.uses_nl or self.uses_lazy):
            return 0.0
        if self.skin_eff is not None:
            return self.skin_eff
        return self.pot.cutoff * self.cfg.relative_skin_distance

    # ---------------- per-shard physics (runs inside shard_map) ----------

    def _force_fn(self, want_energy: bool = True):
        cfg, geom, pot, plan = self.cfg, self.geom, self.pot, self.plan
        e_dtype = cfg.jax_energy_dtype
        chunk = cfg.resolved_box_chunk
        if cfg.comm_impl in ("ki", "ki_fused"):
            from . import pallas_comm
            if (cfg.comm_impl == "ki_fused"
                    and isinstance(pot, EamPotential) and not cfg.spline):
                eval_df, consts = pallas_comm.make_df_eval_for_kernel(
                    pot, cfg.jax_dtype)
                fill = functools.partial(
                    pallas_comm.exchange_scalar_ki_fused, plan, geom,
                    eval_df=eval_df, df_consts=consts)
            else:
                fill = functools.partial(pallas_comm.exchange_scalar_ki,
                                         plan, geom)
        else:
            fill = functools.partial(exchange.exchange_scalar, plan, geom)
        fold = functools.partial(exchange.fold_halo, plan, geom)
        use_async = bool(cfg.resolved_gpu_async)
        use_pallas = (cfg.method == "cta_cell" and not cfg.lj_interpolation
                      and not use_async)
        use_half = (cfg.half_shell and not use_async and not use_pallas
                    and not cfg.lj_interpolation)
        pallas_half = use_pallas and cfg.half_shell
        interpret = jax.default_backend() != "tpu"
        if use_async:
            interior, boundary = cells.boundary_lists(geom, ring=1)

        if isinstance(pot, EamPotential):
            def force(r, n_atoms, r_pre=None):
                if use_pallas:
                    f_loc, u_raw, _dfe = force_eam.eam_force_pallas(
                        geom, pot, r, fill, chunk=max(cfg.resolved_box_chunk, 512),
                        e_dtype=e_dtype, interpret=interpret,
                        want_energy=want_energy, half=pallas_half,
                        fold=fold)
                elif use_async:
                    f_loc, u_raw, _dfe = force_eam.eam_force_split(
                        geom, pot, r, fill, interior, boundary,
                        r_pre=r_pre, spline=cfg.spline, chunk=chunk,
                        e_dtype=e_dtype,
                        interp_impl=cfg.resolved_interp_impl,
                        want_energy=want_energy)
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
                    return f_loc, None
                A = r.shape[-1]
                slot = jax.lax.broadcasted_iota(
                    jnp.int32, (geom.n_local, A), 1)
                valid = slot < n_atoms[:geom.n_local, None]
                _u, e_pot = force_eam.finalize_eam_energy(u_raw, valid, e_dtype)
                return f_loc, e_pot
        else:
            lj_fn = (force_lj.lj_force_interp if cfg.lj_interpolation
                     else force_lj.lj_force)

            def force(r, n_atoms, r_pre=None):
                if use_pallas:
                    from ..ops.pallas.stencil import (lj_force_stencil,
                                                      lj_force_stencil_half)
                    if pallas_half:
                        f_loc, _u, e_pot = lj_force_stencil_half(
                            geom, pot, r, fold,
                            chunk=max(cfg.resolved_box_chunk, 512), e_dtype=e_dtype,
                            interpret=interpret, want_energy=want_energy)
                    else:
                        f_loc, _u, e_pot = lj_force_stencil(
                            geom, pot, r, chunk=max(cfg.resolved_box_chunk, 512),
                            e_dtype=e_dtype, interpret=interpret,
                            want_energy=want_energy)
                elif use_async:
                    f_loc, _u, e_pot = force_lj.lj_force_split(
                        geom, pot, r, interior, boundary, r_pre=r_pre,
                        chunk=chunk, e_dtype=e_dtype,
                        want_energy=want_energy)
                elif use_half:
                    f_loc, _u, e_pot = force_lj.lj_force_half(
                        geom, pot, r, fold, chunk=chunk, e_dtype=e_dtype,
                        want_energy=want_energy, fetch=cfg.half_fetch,
                        materialize=cfg.half_materialize)
                elif cfg.lj_interpolation:
                    f_loc, _u, e_pot = lj_fn(geom, pot, r, chunk=chunk,
                                             e_dtype=e_dtype)
                else:
                    f_loc, _u, e_pot = lj_fn(geom, pot, r, chunk=chunk,
                                             e_dtype=e_dtype,
                                             want_energy=want_energy,
                                             sweep_impl=cfg.resolved_sweep_impl)
                return f_loc, e_pot
        return force


    def _exchange_atoms_fn(self):
        """Atom-exchange transport per Config.comm_impl: XLA collectives
        (default) or the kernel-initiated Pallas RDMA path (the
        exchangeData_Atoms_KI analog, comm_ki.cuh:437-496)."""
        if self.cfg.comm_impl in ("ki", "ki_fused"):
            from . import pallas_comm
            return functools.partial(pallas_comm.exchange_atoms_ki,
                                     self.plan, self.geom)
        return functools.partial(exchange.exchange_atoms, self.plan,
                                 self.geom)

    def _shard_step(self, want_energy: bool = True):
        cfg, geom, plan = self.cfg, self.geom, self.plan
        dt = cfg.dt
        inv_mass = 1.0 / self.mass
        force = self._force_fn(want_energy)
        xatoms = self._exchange_atoms_fn()
        n_local_boxes = geom.n_local

        use_async = bool(cfg.resolved_gpu_async)

        def step(state: SimState, _):
            with jax.named_scope("velocity"):
                p = state.p + state.p.dtype.type(0.5 * dt) * state.f
            with jax.named_scope("position"):
                r = state.r + p * p.dtype.type(dt * inv_mass)
            with jax.named_scope("redistribute"):
                r_pre, p, gid, n_atoms, nmig, ovf1 = binning.rebucket(
                    geom, r, p, state.gid, state.n_atoms, keep_halo=True)
                r, p, gid, n_atoms, ovf2 = xatoms(r_pre, p, gid, n_atoms)
                ovf = jax.lax.psum((ovf1 | ovf2).astype(jnp.int32),
                                   ("x", "y", "z")) > 0
                r, p, gid = binning.sort_cells(r, p, gid)
            # async: interior force sweeps read pre-exchange positions (they
            # are identical on interior cells), so they carry no dependency
            # on the exchange collectives.  On steps where atoms migrated
            # ranks, a migrant that landed in a boundary cell WOULD be stale
            # for ring-2 interior neighbors -- the reference computes
            # interior kernels on post-redistribution cells
            # (timestep.c:257-276) -- so those (rare) steps hand the
            # interior sweep post-exchange positions and give up the
            # overlap, keeping -a 1 exact every step.
            if use_async:
                any_mig = jax.lax.psum(nmig, ("x", "y", "z")) > 0
                r_pre = jnp.where(any_mig, r, r_pre)
            with jax.named_scope("force"):
                f_loc, e_pot = force(r, n_atoms, r_pre if use_async else None)
            f = jnp.zeros_like(state.f).at[:, :n_local_boxes].set(
                f_loc.astype(state.f.dtype))
            p = p + p.dtype.type(0.5 * dt) * f
            e_pot = (state.e_potential if e_pot is None
                     else jax.lax.psum(e_pot, ("x", "y", "z")))
            n_local = jax.lax.psum(
                jnp.sum(n_atoms[:n_local_boxes]), ("x", "y", "z"))
            return SimState(r=r, p=p, f=f, gid=gid, n_atoms=n_atoms,
                            e_potential=e_pot,
                            n_local=n_local.astype(jnp.int32),
                            overflow=state.overflow | ovf), ()

        return step

    def _wrap(self, per_shard_fn, n_steps=None, carry: str = "sim",
              final_fn=None):
        """shard_map a per-shard carry->carry function over the mesh.

        Works for SimState ("sim") and NLSimState ("nl") carries: array
        leaves are sharded P('x','y','z') with [1,1,1] block dims,
        replicated scalars pass through.  With ``final_fn``, the block runs
        n_steps-1 iterations of ``per_shard_fn`` followed by one
        ``final_fn`` (the energy-reporting step of a lazy-energy block).
        """
        spec = self._spec

        def shard_body(state):
            inner = _strip(state)
            if n_steps is None:
                out = per_shard_fn(inner, None)[0]
            else:
                k = n_steps - (1 if final_fn is not None else 0)
                if k:
                    inner, _ = jax.lax.scan(per_shard_fn, inner, None,
                                            length=k)
                out = final_fn(inner, None)[0] if final_fn is not None \
                    else inner
            return _expand(out)

        sim_specs = SimState(
            r=spec, p=spec, f=spec, gid=spec, n_atoms=spec,
            e_potential=P(), n_local=P(), overflow=P())
        if carry == "nl":
            nl_specs = nlmod.NeighborList(
                a_list=spec, a_valid=spec, nl=spec, last_r=spec)
            state_specs = NLSimState(sim=sim_specs, nlist=nl_specs)
        elif carry == "lazy":
            state_specs = LazySimState(sim=sim_specs, last_r=spec)
        else:
            state_specs = sim_specs
        return jax.jit(jax.shard_map(
            shard_body, mesh=self.mesh, in_specs=(state_specs,),
            out_specs=state_specs, check_vma=False))

    # ---------------- neighbor-list (_nl) machinery ----------------

    def _nl_build_params(self):
        cfg = self.cfg
        rcut_nl = self.pot.cutoff + self.skin
        n_rows = nlmod.n_rows_for(self.geom, cfg.max_atoms,
                                  cfg.nl_rows_factor)
        if cfg.nl_max_neighbors > 0:
            k = cfg.nl_max_neighbors
        else:
            density = self.n_global / float(np.prod(self.global_extent))
            mean_nbrs = density * 4.0 / 3.0 * np.pi * rcut_nl ** 3
            k = int(-(-1.4 * mean_nbrs // 32) * 32)
        # -a 1: rows ordered [interior (Ri)] ++ [boundary (Rb)] so the
        # interior sweeps can read pre-exchange state (timestep.c:257-265)
        row_split = (nlmod.row_split_for(self.geom, cfg.max_atoms)
                     if cfg.resolved_gpu_async else None)
        return dict(k=k, rcut2=rcut_nl ** 2, n_rows=n_rows,
                    chunk=cfg.nl_chunk, row_split=row_split)

    def _force_fn_nl(self, want_energy: bool = True):
        cfg, pot, geom, plan = self.cfg, self.pot, self.geom, self.plan
        e_dtype = cfg.jax_energy_dtype
        chunk = cfg.nl_chunk
        use_async = bool(cfg.resolved_gpu_async)
        if use_async:
            _, Ri, _Rb = nlmod.row_split_for(geom, cfg.max_atoms)

        if isinstance(pot, EamPotential):
            def force(nlist, r, n_atoms, r_pre=None):
                fill = functools.partial(exchange.exchange_scalar, plan, geom)
                if use_async:
                    f_full, e_pot, _dfe = force_eam.eam_force_nl_split(
                        nlist, pot, r, fill, Ri, r_pre=r_pre,
                        spline=cfg.spline, chunk=chunk, e_dtype=e_dtype,
                        interp_impl=cfg.resolved_interp_impl,
                        want_energy=want_energy)
                else:
                    f_full, e_pot, _dfe = force_eam.eam_force_nl(
                        nlist, pot, r, fill, spline=cfg.spline, chunk=chunk,
                        e_dtype=e_dtype,
                        interp_impl=cfg.resolved_interp_impl,
                        want_energy=want_energy)
                return f_full, e_pot
        else:
            def force(nlist, r, n_atoms, r_pre=None):
                if use_async:
                    f_full, _u, e_pot = force_lj.lj_force_nl_split(
                        nlist, pot, r, Ri, r_pre=r_pre, chunk=chunk,
                        e_dtype=e_dtype, want_energy=want_energy)
                else:
                    f_full, _u, e_pot = force_lj.lj_force_nl(
                        nlist, pot, r, chunk=chunk, e_dtype=e_dtype,
                        want_energy=want_energy)
                return f_full, e_pot
        return force

    def _shard_step_nl(self, want_energy: bool = True):
        cfg, geom, plan = self.cfg, self.geom, self.plan
        dt = cfg.dt
        inv_mass = 1.0 / self.mass
        force = self._force_fn_nl(want_energy)
        xatoms = self._exchange_atoms_fn()
        skin = self.skin
        params = self._nl_build_params()
        n_local_boxes = geom.n_local
        axes = ("x", "y", "z")

        use_async = bool(cfg.resolved_gpu_async)

        def rebuild(args):
            r, p, gid, n_atoms, _nl = args
            r, p, gid, n_atoms, _nm, ovf = binning.rebucket(
                geom, r, p, gid, n_atoms, keep_halo=True)
            r, p, gid, n_atoms, ovf2 = xatoms(r, p, gid, n_atoms)
            r, p, gid = binning.sort_cells(r, p, gid)
            nl, ovf3 = nlmod.build(geom, r, n_atoms, **params)
            # r_pre = r: rebuild steps (migration possible) give up the
            # -a overlap to stay exact, like the lazy cell path
            return r, p, gid, n_atoms, nl, r, ovf | ovf2 | ovf3

        def refresh(args):
            r, p, gid, n_atoms, nl = args
            r2 = exchange.exchange_positions(plan, geom, r)
            # r_pre = pre-exchange r: local cells identical, so interior
            # sweeps reading it carry no dependency on the collective
            return r2, p, gid, n_atoms, nl, r, jnp.zeros((), jnp.bool_)

        def step(c: NLSimState, _):
            s, nl = c.sim, c.nlist
            p = s.p + s.p.dtype.type(0.5 * dt) * s.f
            r = s.r + p * p.dtype.type(dt * inv_mass)
            # global rebuild consensus (maxIntParallel analog,
            # neighborList.c:236-243)
            dirty_local = nlmod.needs_rebuild(nl, r, n_local_boxes, skin)
            dirty = jax.lax.psum(dirty_local.astype(jnp.int32), axes) > 0
            r, p, gid, n_atoms, nl, r_pre, ovf = jax.lax.cond(
                dirty, rebuild, refresh, (r, p, s.gid, s.n_atoms, nl))
            ovf = jax.lax.psum(ovf.astype(jnp.int32), axes) > 0
            f, e_pot = force(nl, r, n_atoms, r_pre if use_async else None)
            f = f.astype(s.f.dtype)
            p = p + p.dtype.type(0.5 * dt) * f
            e_pot = (s.e_potential if e_pot is None
                     else jax.lax.psum(e_pot, axes))
            n_local = jax.lax.psum(jnp.sum(n_atoms[:n_local_boxes]), axes)
            return NLSimState(
                sim=SimState(r=r, p=p, f=f, gid=gid, n_atoms=n_atoms,
                             e_potential=e_pot,
                             n_local=n_local.astype(jnp.int32),
                             overflow=s.overflow | ovf),
                nlist=nl), ()

        return step

    def _shard_step_lazy(self, want_energy: bool = True):
        """Lazy-shell cell stepping over the mesh: full redistribution
        (rebucket + staged atom exchange + canonical sort) only on the
        psum'd skin/2 trigger; otherwise a slot-aligned ghost-position
        refresh.  Amortizes the per-step redistribution the reference pays
        (timestep.c:69) over ~skin/(2*v*dt) steps."""
        cfg, geom, plan = self.cfg, self.geom, self.plan
        dt = cfg.dt
        inv_mass = 1.0 / self.mass
        force = self._force_fn(want_energy)
        xatoms = self._exchange_atoms_fn()
        skin = self.skin
        n_local_boxes = geom.n_local
        axes = ("x", "y", "z")
        use_async = bool(cfg.resolved_gpu_async)

        def rebuild(args):
            r, p, gid, n_atoms, _last = args
            r1, p, gid, n_atoms, _nm, ovf = binning.rebucket(
                geom, r, p, gid, n_atoms, keep_halo=True)
            r2, p, gid, n_atoms, ovf2 = xatoms(r1, p, gid, n_atoms)
            r2, p, gid = binning.sort_cells(r2, p, gid)
            # r_pre = r2 (not the pre-exchange r1): migration happens ONLY
            # on rebuild steps, so handing the interior sweep post-exchange
            # positions here keeps -a 1 EXACT (migrants arriving into
            # boundary cells stay visible to ring-2 interior neighbors) at
            # the cost of overlap on this 1-in-~70 step; refresh steps keep
            # full overlap since their r_pre differs only in ghost cells,
            # which interior sweeps never read.
            return r2, p, gid, n_atoms, r2, r2, ovf | ovf2

        def refresh(args):
            r, p, gid, n_atoms, last_r = args
            r2 = exchange.exchange_positions(plan, geom, r)
            return (r2, p, gid, n_atoms, last_r, r,
                    jnp.zeros((), jnp.bool_))

        def step(c: LazySimState, _):
            s = c.sim
            p = s.p + s.p.dtype.type(0.5 * dt) * s.f
            r = s.r + p * p.dtype.type(dt * inv_mass)
            dirty_local = nlmod.needs_rebuild(c.last_r, r, n_local_boxes,
                                              skin)
            dirty = jax.lax.psum(dirty_local.astype(jnp.int32), axes) > 0
            r, p, gid, n_atoms, last_r, r_pre, ovf = jax.lax.cond(
                dirty, rebuild, refresh, (r, p, s.gid, s.n_atoms, c.last_r))
            ovf = jax.lax.psum(ovf.astype(jnp.int32), axes) > 0
            f_loc, e_pot = force(r, n_atoms, r_pre if use_async else None)
            f = jnp.zeros_like(s.f).at[:, :n_local_boxes].set(
                f_loc.astype(s.f.dtype))
            p = p + p.dtype.type(0.5 * dt) * f
            e_pot = (s.e_potential if e_pot is None
                     else jax.lax.psum(e_pot, axes))
            n_local = jax.lax.psum(jnp.sum(n_atoms[:n_local_boxes]), axes)
            return LazySimState(
                sim=SimState(r=r, p=p, f=f, gid=gid, n_atoms=n_atoms,
                             e_potential=e_pot,
                             n_local=n_local.astype(jnp.int32),
                             overflow=s.overflow | ovf),
                last_r=last_r), ()

        return step

    def build_neighbor_list(self) -> None:
        params = self._nl_build_params()

        def build_fn(state: SimState, _):
            nl, ovf = nlmod.build(self.geom, state.r, state.n_atoms,
                                  **params)
            ovf = jax.lax.psum(ovf.astype(jnp.int32), ("x", "y", "z")) > 0
            state = dataclasses.replace(state,
                                        overflow=state.overflow | ovf)
            return NLSimState(sim=state, nlist=nl), ()

        # piggyback on _wrap: input SimState, output NLSimState
        spec = self._spec
        sim_specs = SimState(r=spec, p=spec, f=spec, gid=spec, n_atoms=spec,
                             e_potential=P(), n_local=P(), overflow=P())
        nl_specs = nlmod.NeighborList(a_list=spec, a_valid=spec, nl=spec,
                                      last_r=spec)

        def shard_body(state):
            out = build_fn(_strip(state), None)[0]
            return _expand(out)

        fn = jax.jit(jax.shard_map(
            shard_body, mesh=self.mesh, in_specs=(sim_specs,),
            out_specs=NLSimState(sim=sim_specs, nlist=nl_specs),
            check_vma=False))
        out = fn(self.state)
        self.state, self.nlist = out.sim, out.nlist

    # ---------------- public interface ----------------

    def step_block(self, n_steps: int) -> None:
        if n_steps not in self._step_block:
            make, carry = (
                (self._shard_step_nl, "nl") if self.uses_nl else
                (self._shard_step_lazy, "lazy") if self.uses_lazy else
                (self._shard_step, "sim"))
            if n_steps == 1 or self.cfg.energy_every_step:
                fn = self._wrap(make(), n_steps=n_steps, carry=carry)
            else:
                # energy terms only on the block's last step (see
                # sim.Simulation.step_block)
                fn = self._wrap(make(want_energy=False), n_steps=n_steps,
                                carry=carry, final_fn=make())
            self._step_block[n_steps] = fn
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
        n_local_boxes = self.geom.n_local
        if self.uses_nl:
            force_nl = self._force_fn_nl()

            def eval_force_nl(c: NLSimState, _):
                f, e_pot = force_nl(c.nlist, c.sim.r, c.sim.n_atoms)
                e_pot = jax.lax.psum(e_pot, ("x", "y", "z"))
                return dataclasses.replace(
                    c, sim=dataclasses.replace(
                        c.sim, f=f.astype(c.sim.f.dtype),
                        e_potential=e_pot)), ()

            out = self._wrap(eval_force_nl, carry="nl")(
                NLSimState(sim=self.state, nlist=self.nlist))
            self.state, self.nlist = out.sim, out.nlist
            return

        force = self._force_fn()

        def eval_force(state: SimState, _):
            f_loc, e_pot = force(state.r, state.n_atoms)
            f = jnp.zeros_like(state.f).at[:, :n_local_boxes].set(
                f_loc.astype(state.f.dtype))
            e_pot = jax.lax.psum(e_pot, ("x", "y", "z"))
            return dataclasses.replace(state, f=f, e_potential=e_pot), ()

        self.state = self._wrap(eval_force)(self.state)

    def _reductions(self):
        """Jitted global reductions with replicated outputs -- required
        under multi-process execution, where host-side jnp ops on
        non-addressable global arrays are illegal (every process calls
        these collectively, the printRank-independent analog of the
        reference's addRealParallel, parallel.c:120-185)."""
        if getattr(self, "_red", None) is None:
            rep = NamedSharding(self.mesh, P())
            nl = self.geom.n_local
            e_dtype = self.cfg.jax_energy_dtype
            inv_m = 1.0 / self.mass

            @functools.partial(jax.jit, out_shardings=rep)
            def ke(p):
                return 0.5 * inv_m * jnp.sum(
                    jnp.asarray(p[..., :nl, :], e_dtype) ** 2)

            @functools.partial(jax.jit, out_shardings=rep)
            def n_sum(n_atoms):
                return jnp.sum(n_atoms[..., :nl, ])

            @functools.partial(jax.jit, out_shardings=rep)
            def occ_max(n_atoms):
                return jnp.max(n_atoms[..., :nl, ])

            self._red = (ke, n_sum, occ_max)
        return self._red

    def kinetic_energy(self) -> float:
        return float(self._reductions()[0](self.state.p))

    @property
    def e_potential(self) -> float:
        # replicated scalar stored per-shard identically
        return float(jnp.reshape(self.state.e_potential, (-1,))[0]) \
            if self.state.e_potential.ndim else float(self.state.e_potential)

    def sum_atoms(self) -> int:
        return int(self._reductions()[1](self.state.n_atoms))

    def temperature(self) -> float:
        return self.kinetic_energy() / self.n_global / KB_EV / 1.5

    def max_occupancy(self) -> int:
        return int(self._reductions()[2](self.state.n_atoms))

    def occupancy_histogram(self):
        """[capacity+1] global cell-occupancy histogram (collective)."""
        rep = NamedSharding(self.mesh, P())
        nl, cap = self.geom.n_local, self.cfg.max_atoms

        @functools.partial(jax.jit, out_shardings=rep)
        def hist(n_atoms):
            n = n_atoms[..., :nl].reshape(-1)
            return jnp.sum(
                (n[:, None] == jnp.arange(cap + 1)[None, :]).astype(
                    jnp.int32), axis=0)

        import numpy as np
        return np.asarray(hist(self.state.n_atoms))


def _block_shape(geom, cfg: Config, field: str):
    B, A = geom.n_total, cfg.max_atoms
    return {"r": (3, B, A), "p": (3, B, A), "f": (3, B, A),
            "gid": (B, A), "n_atoms": (B,)}[field]


def _gen_shard_atoms(cfg: Config, lat: float, global_extent, local_extent,
                     coord):
    """Generate (r global-frame, gid) for ONE shard brick, reproducing the
    single-controller partition exactly: assignment by displaced position
    with floor + edge-clip semantics.  Undisplaced sites within
    initial_delta of the brick are generated too (they may displace in);
    edge shards keep atoms displaced past the global boundary (the clip).

    This is the per-rank analog of createFccLattice's local-window
    generation (initAtoms.c:81-124): no process ever materializes the
    global atom set."""
    pgrid = np.array([cfg.xproc, cfg.yproc, cfg.zproc])
    coord = np.asarray(coord)
    delta = cfg.initial_delta
    lmin = coord * local_extent
    lmax = lmin + local_extent
    gmin = np.maximum(lmin - (delta + 1e-9), 0.0)
    gmax = np.minimum(lmax + (delta + 1e-9), global_extent)
    r, gid = lattice.create_fcc_lattice(cfg.nx, cfg.ny, cfg.nz, lat,
                                        gmin, gmax)
    r = lattice.random_displacements(r, gid, delta)
    lo = np.where(coord == 0, -np.inf, lmin)
    hi = np.where(coord == pgrid - 1, np.inf, lmax)
    keep = np.all((r >= lo) & (r < hi), axis=1)
    return r[keep], gid[keep]


def _owned_coords(mesh: Mesh):
    """Mesh coordinates of the shards whose device belongs to this process
    (every coordinate in single-process runs)."""
    pidx = jax.process_index()
    return [tuple(int(c) for c in idx)
            for idx in np.ndindex(*mesh.devices.shape)
            if mesh.devices[idx].process_index == pidx]


def init_sharded_simulation(cfg: Config, devices=None,
                            timers=None) -> ShardedSimulation:
    """Sharded initSimulation: decompose, generate per shard, assemble.

    Multi-host capable (the reference's N-rank MPI launch, parallel.c:66-118,
    run via jax.distributed): each process generates and bins ONLY the
    shards its devices own; the global state arrays are assembled with
    jax.make_array_from_callback, so host memory stays O(local atoms).
    Cross-process agreement on the cell plan uses a (max, min) reduce over
    per-process occupancy stats; the temperature init reproduces the global
    momentum sums bit-for-bit from the gid-seeded RNG streams alone
    (lattice.temperature_params)."""
    cfg = cfg.resolve()
    pot = init_potential(cfg)

    lat = cfg.lat if cfg.lat > 0 else pot.lat
    global_extent = np.array([cfg.nx, cfg.ny, cfg.nz], np.float64) * lat
    pgrid = np.array([cfg.xproc, cfg.yproc, cfg.zproc])
    local_extent = global_extent / pgrid
    n_global = 4 * cfg.nx * cfg.ny * cfg.nz

    mesh = make_mesh(cfg.xproc, cfg.yproc, cfg.zproc, devices)
    my_coords = _owned_coords(mesh)

    # generate this process's shard bricks (positions first: the cell plan
    # needs the t=0 occupancy)
    shard_atoms = {
        c: _gen_shard_atoms(cfg, lat, global_extent, local_extent, c)
        for c in my_coords}
    r_local = (np.concatenate([a[0] for a in shard_atoms.values()])
               if shard_atoms else np.zeros((0, 3)))

    stat_reduce = None
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def stat_reduce(stats):
            allv = np.asarray(multihost_utils.process_allgather(
                np.asarray(stats, np.float64)))
            return int(allv[:, 0].max()), float(allv[:, 1].min())

    # per-shard geometry in the shard-local frame [0, local_extent); the
    # lazy-shell path folds the skin into the cell size (cells sized to
    # cutoff alone would let atoms drift out of the 27-neighborhood between
    # skin/2-triggered rebuilds)
    cfg, geom, cplan = plan_geometry(
        cfg, pot, lat, r_local, (cfg.nx, cfg.ny, cfg.nz),
        (cfg.xproc, cfg.yproc, cfg.zproc), np.zeros(3), local_extent,
        n_atoms_total=n_global, stat_reduce=stat_reduce)
    plan = exchange.make_plan(geom, msg_factor=cfg.halo_msg_factor,
                              max_atoms=cfg.max_atoms)

    # momenta: global (vcm, scale) from the gid-seeded streams, applied to
    # the local subsets (bitwise equal to the serial setTemperature)
    vcm, scale = lattice.temperature_params(pot.mass, cfg.temperature,
                                            n_global)
    blocks = {}
    for c, (r_s, gid_s) in shard_atoms.items():
        p_s = lattice.apply_temperature(gid_s, pot.mass, cfg.temperature,
                                        vcm, scale)
        blocks[c] = bin_atoms_host_np(
            geom, cfg, r_s - np.asarray(c) * local_extent, p_s, gid_s)

    spec = P("x", "y", "z")
    shard = NamedSharding(mesh, spec)
    rep = NamedSharding(mesh, P())
    pg = tuple(int(v) for v in pgrid)

    def mk(field):
        blk0 = next(iter(blocks.values()))[field] if blocks else None
        # every process knows the block shape even if it owns no shard
        shape_probe = blk0.shape if blk0 is not None else _block_shape(
            geom, cfg, field)
        gshape = pg + tuple(shape_probe)

        def cb(index):
            coord = tuple((s.start or 0) for s in index[:3])
            return blocks[coord][field][None, None, None]

        return jax.make_array_from_callback(gshape, shard, cb)

    def mk_rep(value, dtype):
        v = np.asarray(value, dtype)
        return jax.make_array_from_callback(
            v.shape, rep, lambda idx: v[idx])

    state = SimState(
        r=mk("r"), p=mk("p"), f=mk("f"), gid=mk("gid"),
        n_atoms=mk("n_atoms"),
        e_potential=mk_rep(0.0, cfg.energy_dtype),
        n_local=mk_rep(n_global, np.int32),
        overflow=mk_rep(False, np.bool_),
    )

    sim = ShardedSimulation(
        cfg=cfg, pot=pot, geom=geom, plan=plan, mesh=mesh,
        global_extent=global_extent, n_global=n_global, state=state,
        lattice_const=lat, skin_eff=cplan.skin)

    # initial ghost fill: run the exchange once (atoms are freshly binned)
    from ..sim import _tscope
    with _tscope(timers, "redistribute"), _tscope(timers, "atomHalo"):
        sim.state = jax.block_until_ready(
            sim._wrap(_initial_exchange_fn(sim))(sim.state))
    if sim.uses_nl:
        with _tscope(timers, "neighborList"):
            sim.build_neighbor_list()
            jax.block_until_ready(sim.nlist)
    with _tscope(timers, "force"):
        sim.compute_force()
        sim.state.f.block_until_ready()
    return sim


def _initial_exchange_fn(sim: ShardedSimulation):
    geom, plan = sim.geom, sim.plan
    xatoms = sim._exchange_atoms_fn()

    def fn(state: SimState, _):
        r, p, gid, n_atoms, ovf = xatoms(
            state.r, state.p, state.gid, state.n_atoms)
        r, p, gid = binning.sort_cells(r, p, gid)
        # propagate the overflow flag: an undersized packed-message capacity
        # (or cell capacity) can fire on the very first ghost fill
        ovf = jax.lax.psum(ovf.astype(jnp.int32), ("x", "y", "z")) > 0
        return dataclasses.replace(state, r=r, p=p, gid=gid,
                                   n_atoms=n_atoms,
                                   overflow=state.overflow | ovf), ()

    return fn
