"""Trustworthy TPU step timing through the axon relay.

block_until_ready() through the relay can return before device work drains,
and one-off D2H reads can stall for unrelated relay reasons.  So: force a
real value transfer (float()) after every block, and estimate per-step cost
from the *difference* between a long and a short block (fixed overheads --
dispatch, transfer, stalls -- cancel).

Usage: python tools/tpu_bench.py <nx> <lj|eam> [short] [long]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import comd_tpu  # noqa: E402
from comd_tpu import Config  # noqa: E402
from comd_tpu.sim import init_simulation  # noqa: E402


def main():
    n = int(sys.argv[1])
    doeam = sys.argv[2] == "eam"
    short = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    long = int(sys.argv[4]) if len(sys.argv) > 4 else short * 5
    method = sys.argv[5] if len(sys.argv) > 5 else "thread_atom"

    T0 = time.time()

    def log(m):
        print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)

    import os
    chunk = int(os.environ.get("BENCH_CHUNK", 0))   # 0 = auto by sweep impl
    max_atoms = int(os.environ.get("BENCH_MAXATOMS", 0))   # 0 = auto
    cell_mode = os.environ.get("BENCH_CELLMODE", "auto")
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    interp = os.environ.get("BENCH_INTERP", "auto")
    half = os.environ.get("BENCH_HALF", "0") == "1"
    half_fetch = os.environ.get("BENCH_HALF_FETCH", "slices")
    half_mat = os.environ.get("BENCH_HALF_MAT", "0") == "1"
    hilbert = os.environ.get("BENCH_HILBERT", "0") == "1"
    sweep = os.environ.get("BENCH_SWEEP", "auto")
    pot_type = os.environ.get("BENCH_POT_TYPE", "funcfl")
    ljcut = float(os.environ.get("BENCH_LJCUT", 2.5))  # fork's 5-sigma: 5
    cfg = Config(nx=n, ny=n, nz=n, doeam=doeam, temperature=600.0,
                 dtype=dtype, max_atoms=max_atoms, cell_mode=cell_mode,
                 interp_impl=interp, box_chunk=chunk, sweep_impl=sweep,
                 half_shell=half, half_fetch=half_fetch,
                 half_materialize=half_mat, method=method, pot_type=pot_type,
                 do_hilbert=hilbert, lj_cutoff_factor=ljcut,
                 pot_dir="/root/repo/pots")
    sim = init_simulation(cfg)
    log(f"init done atoms={sim.n_global} method={method} "
        f"cell_mode={sim.cfg.cell_mode} A={sim.cfg.max_atoms} "
        f"grid={sim.geom.grid} occ_max={sim.max_occupancy()}")

    # Marginal timing over printRate-sized blocks: `short`/`long` count
    # BLOCKS of `block` steps each, so the energy-reporting step (1 per
    # block, the printRate cadence) is included at its true amortized cost.
    block = int(os.environ.get("BENCH_BLOCK", 10))

    def run(k):
        for _ in range(k):
            sim.step_block(block)
        return float(sim.state.e_potential)  # real D2H sync

    # compile (one program: the `block`-step scan)
    run(1)
    log(f"compiled scan-{block}")

    samples = []
    for _ in range(3):
        t0 = time.time()
        run(short)
        ts = time.time() - t0
        t0 = time.time()
        run(long)
        tl = time.time() - t0
        per_step = (tl - ts) / ((long - short) * block)
        samples.append(per_step)
        log(f"short({short}x{block})={ts:7.3f}s long({long}x{block})="
            f"{tl:7.3f}s -> {per_step*1e3:8.2f} ms/step "
            f"({sim.n_global/max(per_step,1e-12):.3e} atom-steps/s)")
    # relay stalls can corrupt a sample (even negative marginals when the
    # short block absorbs a stall); keep positive samples only
    good = [s for s in samples if s > 0]
    best = min(good) if good else float("nan")
    log(f"BEST {best*1e3:.2f} ms/step = "
        f"{sim.n_global/best:.3e} atom-steps/s  "
        f"ePot/atom={sim.e_potential/sim.n_global:.6f}")
    import numpy as np
    na = np.asarray(sim.state.n_atoms)[..., :sim.geom.n_local]
    log(f"final occupancy max={na.max()} mean={na.mean():.2f} "
        f"capacity={sim.cfg.max_atoms} "
        f"overflow={bool(np.any(np.asarray(sim.state.overflow)))} "
        f"atoms={sim.sum_atoms()}")


if __name__ == "__main__":
    main()
