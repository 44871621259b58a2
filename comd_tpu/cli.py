"""Command-line driver, flag-compatible with the reference binary.

Every short/long option of the reference parser is accepted with identical
semantics (flag table: src-mpi/mycommand.c:225-251); TPU-specific options are
added under their own group.  The run loop reproduces the reference main():
prolog -> printRate-step blocks with printThings lines -> validation ->
timing report + YAML file (CoMD.c:86-187, 463-552).
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time

from .config import Config
from .constants import KB_EV


def jnp_any(x) -> bool:
    import numpy as np
    return bool(np.any(np.asarray(x)))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="comd-tpu",
        description="TPU-native CoMD: classical molecular dynamics "
                    "(LJ / EAM) with link cells over a JAX device mesh.")
    a = p.add_argument
    a("-d", "--potDir", default="pots", help="potential directory")
    a("-p", "--potName", default="", help="potential name")
    a("-t", "--potType", default="funcfl",
      help="potential type (funcfl or setfl)")
    a("-e", "--doeam", action="store_true", help="compute eam potentials")
    a("-x", "--nx", type=int, default=20, help="number of unit cells in x")
    a("-y", "--ny", type=int, default=20, help="number of unit cells in y")
    a("-z", "--nz", type=int, default=20, help="number of unit cells in z")
    a("-i", "--xproc", type=int, default=1, help="processors in x direction")
    a("-j", "--yproc", type=int, default=1, help="processors in y direction")
    a("-k", "--zproc", type=int, default=1, help="processors in z direction")
    a("-N", "--nSteps", type=int, default=100, help="number of time steps")
    a("-n", "--printRate", type=int, default=10,
      help="number of steps between output")
    a("-D", "--dt", type=float, default=1.0, help="time step (in fs)")
    a("-l", "--lat", type=float, default=-1.0,
      help="lattice parameter (Angstroms)")
    a("-T", "--temp", type=float, default=600.0,
      help="initial temperature (K)")
    a("-r", "--delta", type=float, default=0.0,
      help="initial delta (Angstroms)")
    a("-H", "--hilbert", action="store_true",
      help="space-filling curve for the traversal of cells")
    a("-S", "--skinDistance", type=float, default=0.1,
      help="skin distance (relative to cutoff)")
    a("-m", "--method", default="thread_atom",
      help="thread_atom,warp_atom,warp_atom_nl,cta_cell,thread_atom_nl,cpu_nl")
    a("-a", "--gpuAsync", type=int, default=-1,
      help="communication hiding optimization (interior/boundary overlap); "
           "-1 = auto: ON for *_nl methods (measured 10.5%% EAM win, "
           "noise-neutral LJ), OFF for cell sweeps (costs 8-15%% "
           "single-chip; pass -a 1 explicitly for multi-chip cell runs)")
    a("-s", "--gpuProfile", action="store_true",
      help="profiling mode: reboxing disabled, single force run")
    a("-I", "--ljInterpolation", action="store_true",
      help="compute Lennard-Jones potential using interpolation")
    a("--ljCutoffFactor", type=float, default=2.5,
      help="LJ cutoff in units of sigma (2.5 = upstream CoMD golden "
           "config; 5 = the reference fork's ljForce.c:114)")
    a("-P", "--spline", action="store_true",
      help="use splines for interpolation")
    a("-L", "--usePairlist", action="store_true",
      help="use pairlists in Lennard-Jones computation")
    # --- TPU-native extensions ---
    a("--maxAtoms", type=int, default=0,
      help="per-cell capacity (reference compile-time MAXATOMS); "
           "0 = auto-size from the t=0 occupancy")
    a("--cellMode", default="auto",
      choices=["auto", "commensurate", "classic"],
      help="cell sizing: classic reference floor(extent/cutoff), "
           "lattice-commensurate (k/2)*lat cells (uniform occupancy, "
           "no capacity slack), or auto (price both, take the cheaper)")
    a("--dtype", default="float32", choices=["float32", "float64"],
      help="dynamics precision (energies always f64-accumulated)")
    a("--boxChunk", type=int, default=0,
      help="cells per force-sweep chunk (0 = auto by sweep impl)")
    a("--sweepImpl", default="auto",
      choices=["auto", "gather", "dense", "dense_w", "dense_wg", "dense_wf",
               "dense_f", "dense_t"],
      help="cell-sweep formulation (auto = measured-best by capacity; "
           "see config.Config.sweep_impl)")
    a("--interpImpl", default="auto",
      choices=["auto", "cheb", "twolevel", "rows"],
      help="EAM table evaluator (auto = cheb for f32, twolevel for f64)")
    a("--commImpl", default="collective",
      choices=["collective", "ki", "ki_fused"],
      help="halo transport: XLA collectives or the Pallas RDMA "
           "kernel-initiated analog (comm_ki)")
    a("--halfShell", action="store_true",
      help="Newton's-3rd-law pair-once sweeps (the reference half-list "
           "kernels; with -m cta_cell, the Pallas dual-delivery kernel)")
    a("--halfFetch", default="slices", choices=["slices", "window"],
      help="half-sweep j delivery: per-offset dynamic slices or one "
           "contiguous per-chunk window (static in-window views)")
    a("--halfMaterialize", action="store_true",
      help="half sweeps: materialize the pair block behind an optimization "
           "barrier before the dual i/j reduction (keeps XLA from "
           "rematerializing the pair chain once per reduce side)")
    a("--haloMsgFactor", type=float, default=0.6,
      help="count-packed atom halo messages: per-face entry capacity as a "
           "fraction of the full two-plane slot count (0 ships full planes; "
           "overflow aborts; see config.Config.halo_msg_factor)")
    a("--energyEveryStep", action="store_true",
      help="compute potential energy on every step instead of only at "
           "printRate boundaries (identical dynamics either way)")
    a("--yaml", default=None, help="YAML report output directory (off if unset)")
    a("--analyze", action="store_true",
      help="print the link-cell occupancy histogram (AnalyzeInput)")
    a("--checkpoint", default=None, metavar="DIR",
      help="write a checkpoint to DIR at the end of the run (and every "
           "--checkpointRate steps if set)")
    a("--checkpointRate", type=int, default=0,
      help="steps between periodic checkpoints (0 = final only)")
    a("--restore", default=None, metavar="DIR",
      help="resume from a checkpoint directory (geometry/potential flags "
           "come from the stored config; -N adds steps on top)")
    # --- multi-host launch (the reference's mpirun surface, parallel.c) ---
    import os as _os
    a("--coordinator", default=_os.environ.get("COMD_COORDINATOR"),
      metavar="HOST:PORT",
      help="jax.distributed coordinator address (process 0's host:port); "
           "enables multi-process execution together with --numProcs")
    a("--numProcs", type=int,
      default=int(_os.environ.get("COMD_NUM_PROCS", "1")),
      help="total number of launched processes (multi-host slice)")
    a("--procId", type=int,
      default=int(_os.environ.get("COMD_PROC_ID", "-1")),
      help="this process's id in 0..numProcs-1")
    return p


def config_from_args(args) -> Config:
    return Config(
        pot_dir=args.potDir, pot_name=args.potName, pot_type=args.potType,
        doeam=args.doeam, nx=args.nx, ny=args.ny, nz=args.nz,
        xproc=args.xproc, yproc=args.yproc, zproc=args.zproc,
        n_steps=args.nSteps, print_rate=args.printRate, dt=args.dt,
        lat=args.lat, temperature=args.temp, initial_delta=args.delta,
        do_hilbert=args.hilbert, relative_skin_distance=args.skinDistance,
        method=args.method, gpu_async=args.gpuAsync,
        gpu_profile=args.gpuProfile, lj_interpolation=args.ljInterpolation,
        spline=args.spline, use_pairlist=args.usePairlist,
        lj_cutoff_factor=args.ljCutoffFactor,
        max_atoms=args.maxAtoms, cell_mode=args.cellMode,
        dtype=args.dtype, box_chunk=args.boxChunk,
        sweep_impl=args.sweepImpl, interp_impl=args.interpImpl,
        comm_impl=args.commImpl,
        half_shell=args.halfShell, half_fetch=args.halfFetch,
        half_materialize=args.halfMaterialize,
        halo_msg_factor=args.haloMsgFactor,
        energy_every_step=args.energyEveryStep,
    )


HEADER = (
    "#                                                                   "
    "                      Performance\n"
    "#  Loop   Time(fs)       Total Energy   Potential Energy     "
    "Kinetic Energy  Temperature   (us/atom)     # Atoms")


def print_things(sim, i_step: int, elapsed: float, n_eval: int,
                 out=sys.stdout, timers=None):
    """Per-printRate status line (printThings, CoMD.c:463-494).

    The kinetic-energy / atom-count reductions here are the run's real
    collective-reduction dispatches -- the commReduce timer row
    (performanceTimers.c:55-68, parallel.c:120-185)."""
    if timers is not None:
        timers.start("commReduce")
    e_pot = sim.e_potential
    e_kin = sim.kinetic_energy()
    n_sum = sim.sum_atoms()
    if timers is not None:
        timers.stop("commReduce")
    n = sim.n_global
    e_total = (e_pot + e_kin) / n
    temp = (e_kin / n) / (KB_EV * 1.5)
    t = i_step * sim.cfg.dt
    us_per_atom = 1.0e6 * elapsed / (n_eval * max(n_sum, 1))
    print(f" {i_step:6d} {t:10.2f} {e_total:18.12f} {e_pot / n:18.12f} "
          f"{e_kin / n:18.12f} {temp:12.4f} {us_per_atom:10.4f} {n:12d}",
          file=out, flush=True)


def run(cfg: Config, out=sys.stdout, yaml_dir: str | None = None,
        analyze: bool = False, restore: str | None = None,
        checkpoint: str | None = None, checkpoint_rate: int = 0) -> dict:
    """Full reference-style run. Returns a result summary dict."""
    from . import sim as sim_mod
    from .utils.timers import PerfTimers

    timers = PerfTimers()
    timers.start("total")
    step0 = 0
    if restore is not None:
        from .utils import checkpoint as ckpt
        sim, step0 = ckpt.load(restore)
        print(f"Restored checkpoint {restore} at step {step0}", file=out)
        # physics/geometry come from the stored config; the run-control
        # flags (-N steps to add, -n print rate) from THIS command line.
        # Warn about any other flag that differs from the stored config --
        # it is silently ignored, which would otherwise surprise (e.g. an
        # -e or --dtype mismatch).
        ignored = []
        for f in dataclasses.fields(cfg):
            if f.name in ("n_steps", "print_rate"):
                continue
            new, old = getattr(cfg, f.name), getattr(sim.cfg, f.name)
            if new != old and new != getattr(Config(), f.name):
                ignored.append(f"{f.name}={new!r} (checkpoint has {old!r})")
        if ignored:
            print("# WARNING: --restore ignores these flags; the stored "
                  "config wins: " + ", ".join(ignored), file=out)
        sim.cfg = dataclasses.replace(sim.cfg, n_steps=cfg.n_steps,
                                      print_rate=cfg.print_rate)
    else:
        sim = sim_mod.init_simulation(cfg, timers=timers)
    cfg = sim.cfg

    for key, val in sim.pot.describe():
        print(f"  {key:<17}: {val}", file=out)
    print(file=out)
    if analyze:
        analyze_input(sim, out=out)

    if cfg.comm_impl != "collective" and \
            cfg.xproc * cfg.yproc * cfg.zproc == 1:
        print(f"# WARNING: --commImpl {cfg.comm_impl} selects a halo "
              "TRANSPORT and only applies to multi-device runs (-i/-j/-k); "
              "this serial run has no halo exchange to transport.",
              file=out)

    if cfg.resolved_gpu_async:
        serial = cfg.xproc * cfg.yproc * cfg.zproc == 1
        if cfg.gpu_async > 0 and serial:
            # Explicit -a 1 on any serial run is inert: the single-process
            # implementation (sim.Simulation) has no exchange to overlap
            # and never reads the flag -- including the NL families, whose
            # measured win lives in the sharded machinery.
            print("# WARNING: -a 1 overlaps interior force compute with the "
                  "halo collectives and only applies to multi-device runs "
                  "(-i/-j/-k); this serial run has no exchange to overlap "
                  "and ignores -a.", file=out)
        elif not serial and (cfg.method == "cta_cell" or
                             (cfg.half_shell and
                              not (cfg.use_nl or cfg.use_pairlist))):
            # Only cell-family sweeps are replaced by the split formulation;
            # half_shell never applied to the NL force paths, so an
            # auto-resolved -a 1 there must not claim it replaced anything.
            print("# WARNING: -a 1 replaces the cta_cell/half-shell sweep "
                  "with the interior/boundary split XLA sweeps (the overlap "
                  "needs the split formulation).", file=out)

    import jax
    if jax.default_backend() == "tpu" and cfg.doeam and (
            cfg.spline or cfg.resolved_interp_impl == "rows"):
        print("# note: -P/rows evaluate tables via per-pair gathers, which "
              "run ~100x slower than the default Chebyshev path on TPU; "
              "these modes exist for reference-exact parity.", file=out)

    e0 = (sim.e_potential + sim.kinetic_energy()) / sim.n_global
    n0 = sim.sum_atoms()
    print(f"Initial energy : {e0:14.12f}, atom count : {n0}\n", file=out)
    print(HEADER, file=out)

    timers.start("loop")
    i_step = step0
    n_end = step0 + cfg.n_steps
    print_things(sim, i_step, 1e-9, 1, out=out, timers=timers)
    while i_step < n_end:
        n_block = min(cfg.print_rate, n_end - i_step)
        timers.start("timestep")
        t0 = time.perf_counter()
        sim.step_block(n_block)
        sim.state.e_potential.block_until_ready()
        dt_wall = time.perf_counter() - t0
        timers.stop("timestep")
        i_step += n_block
        if bool(jnp_any(sim.state.overflow)):
            raise RuntimeError(
                f"capacity overflow at step {i_step}: a cell exceeded "
                f"--maxAtoms (max_atoms={cfg.max_atoms}), a neighbor list "
                f"row exceeded its K, or a packed halo message exceeded "
                f"--haloMsgFactor (current {cfg.halo_msg_factor}; 0 ships "
                f"full planes). Raise the matching knob and rerun.")
        print_things(sim, i_step, dt_wall, n_block, out=out, timers=timers)
        # periodic checkpoint on interval CROSSINGS, so rates that are not
        # a multiple of printRate still fire
        if checkpoint is not None and checkpoint_rate > 0 and \
                i_step < n_end and \
                (i_step - step0) // checkpoint_rate > \
                (i_step - n_block - step0) // checkpoint_rate:
            from .utils import checkpoint as ckpt
            ckpt.save(checkpoint, sim, i_step)
            print(f"# checkpoint written at step {i_step}", file=out)
    timers.stop("loop")
    if checkpoint is not None:
        from .utils import checkpoint as ckpt
        ckpt.save(checkpoint, sim, i_step)
        print(f"# final checkpoint written to {checkpoint} "
              f"(step {i_step})", file=out)

    # validation (validateResult, CoMD.c:413-440)
    e_final = (sim.e_potential + sim.kinetic_energy()) / sim.n_global
    n_final = sim.sum_atoms()
    print("\n\nSimulation Validation:", file=out)
    print(f"  Initial energy  : {e0:14.12f}", file=out)
    print(f"  Final energy    : {e_final:14.12f}", file=out)
    print(f"  eFinal/eInitial : {e_final / e0:f}", file=out)
    if n_final == n0:
        print(f"  Final atom count : {n_final}, no atoms lost", file=out)
    else:
        print("#############################", file=out)
        print(f"# WARNING: {n0 - n_final:6d} atoms lost #", file=out)
        print("#############################", file=out)

    # stop the run timers BEFORE any -s profiling: the profiler's own
    # compiles and repeated dispatches must not inflate the reported total
    timers.stop("total")

    if cfg.gpu_profile:
        # -s: single-force profiling mode (CoMD.c:216-218) -- attribute the
        # step phases with separately dispatched, scanned blocks
        from .utils.profile import profile_phases, report_phases
        print("\nProfiling mode (-s): phase-attributed timing", file=out)
        phases = profile_phases(sim, out=out)
        print(report_phases(phases, sim.n_global), file=out)
        analyze_input(sim, out=out)
    print(timers.report(sim.n_global, cfg.n_steps), file=out)
    print(timers.rank_stats(), file=out)

    result = {
        "e_initial": e0,
        "e_final": e_final,
        "atoms_lost": n0 - n_final,
        "atom_rate_atoms_per_us": timers.atom_rate(sim.n_global, cfg.n_steps),
        "n_global": sim.n_global,
    }

    if yaml_dir is not None:
        _write_yaml(yaml_dir, cfg, sim, result, timers, out)
    return result


def _write_yaml(yaml_dir, cfg: Config, sim, result, timers, out):
    """YAML run report (yamlOutput.c, CoMD.c:498-552).  Collective-safe:
    every process computes the global reductions, only process 0 writes."""
    from . import __version__
    from .utils.yaml_output import YamlReport

    max_occ = sim.max_occupancy()          # collective under multi-process
    import jax
    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    rep = YamlReport(out_dir=yaml_dir).open()
    rep.header(__version__)
    rep.section("Command Line Parameters")
    for k, v in vars(cfg).items():
        rep.kv(k, v)
    rep.section("Simulation data")
    rep.kv("Total atoms", sim.n_global)
    rep.kv("Min global bounds", [0.0, 0.0, 0.0])
    rep.kv("Max global bounds", list(sim.global_extent))
    rep.section("Decomposition data")
    rep.kv("Processors", [cfg.xproc, cfg.yproc, cfg.zproc])
    rep.kv("Local boxes", list(sim.geom.grid))
    rep.kv("Box size", list(sim.geom.box_size))
    rep.kv("Box factor", list(sim.geom.box_size / sim.pot.cutoff))
    rep.kv("Max Link Cell Occupancy",
           f"{max_occ} of {cfg.max_atoms}")
    rep.section("Potential data")
    for k, v in sim.pot.describe():
        rep.kv(k, v)
    rep.section("Validation")
    rep.kv("Initial energy", f"{result['e_initial']:.12f}")
    rep.kv("Final energy", f"{result['e_final']:.12f}")
    rep.kv("Atoms lost", result["atoms_lost"])
    rep.section("Performance")
    rep.kv("Atom rate (atoms/us)",
           f"{result['atom_rate_atoms_per_us']:.4f}")
    rep.close()
    print(f"YAML report written to {rep.path}", file=out)


def analyze_input(sim, out=sys.stdout):
    """Occupancy histogram of link cells (AnalyzeInput,
    src-mpi/gpu_utility.c:785-862)."""
    import numpy as np
    hist = np.asarray(sim.occupancy_histogram())
    print("# cell-occupancy histogram (atoms-per-cell, num-cells)", file=out)
    for occ, n in enumerate(hist):
        if n:
            print(f"{occ:4d} {n:8d}", file=out)
    occ = np.arange(len(hist))
    n_cells = hist.sum()
    mean = float((occ * hist).sum() / max(n_cells, 1))
    hi = int(occ[hist > 0].max()) if n_cells else 0
    print(f"# mean {mean:.2f}  max {hi}  "
          f"capacity {sim.cfg.max_atoms}", file=out)


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    out = sys.stdout
    if args.numProcs > 1:
        # multi-process launch (initParallel analog, parallel.c:66-118):
        # every process runs the same program; only process 0 prints
        # (printRank, parallel.c:48-52)
        import jax
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.numProcs, process_id=args.procId)
        if jax.process_index() != 0:
            import os
            out = open(os.devnull, "w")
    try:
        run(cfg, out=out, yaml_dir=args.yaml, analyze=args.analyze,
            restore=args.restore, checkpoint=args.checkpoint,
            checkpoint_rate=args.checkpointRate)
    except (ValueError, FileNotFoundError) as e:
        print(f"comd-tpu: {e}. Fatal Error.", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
