"""On-device sweep-configuration autotune.

The auto policy in ``config.Config`` encodes v5e measurements (sweep form
and chunk size by per-cell capacity; docs/BENCHMARKS.md rounds 3c-3d).  On
a different chip class (v5p VMEM is larger, so spill boundaries move) the
best (sweep_impl, box_chunk) pair can differ: this tool measures the
candidates on the *current* device for a given problem and prints a ranked
table plus the winning Config overrides.

Timing uses the marginal method (long minus short scan block) because
relay-attached devices cannot be trusted for one-off timings (see
tools/tpu_bench.py).

Usage (gate TPU runs -- one TPU process at a time, see CLAUDE.md):
    ./tools/tpu_gate.sh python tools/autotune.py <nx> <lj|eam> \
        [--steps N] [--quick]

Environment: BENCH_DTYPE / BENCH_MAXATOMS / BENCH_CELLMODE as in
tools/tpu_bench.py.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from comd_tpu import Config  # noqa: E402
from comd_tpu.sim import init_simulation  # noqa: E402

SWEEPS = ["gather", "dense", "dense_w", "dense_wg", "dense_wf", "dense_f"]
# pair-once half sweeps (cell_pair_sweep_half): "half_w" = window fetch,
# "half_s" = per-offset slices, "half_wm" = window + materialize barrier
HALF = {"half_w": ("window", False), "half_s": ("slices", False),
        "half_wm": ("window", True)}


def candidates(quick: bool):
    chunks = [256, 1024] if quick else [256, 512, 1024, 2048]
    for impl in (["gather", "dense_w", "dense_f"] if quick else SWEEPS):
        for chunk in chunks:
            # the gather form's 27 dynamic row-gathers grow with C and
            # spill VMEM well before the slice forms do (round 3c)
            if impl == "gather" and chunk > 512:
                continue
            yield impl, chunk
    for impl in (["half_w"] if quick else list(HALF)):
        for chunk in ([512, 1024] if quick else [256, 512, 1024]):
            yield impl, chunk


def make_cfg(base: dict, impl: str, chunk: int) -> Config:
    if impl in HALF:
        fetch, mat = HALF[impl]
        return Config(**base, half_shell=True, half_fetch=fetch,
                      half_materialize=mat, box_chunk=chunk)
    return Config(**base, sweep_impl=impl, box_chunk=chunk)


def time_config(cfg: Config, block: int, short: int, long: int) -> float:
    sim = init_simulation(cfg)

    def run(k):
        for _ in range(k):
            sim.step_block(block)
        return float(sim.state.e_potential)  # force a real D2H sync

    run(1)  # compile
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        run(short)
        ts = time.time() - t0
        t0 = time.time()
        run(long)
        tl = time.time() - t0
        per_step = (tl - ts) / ((long - short) * block)
        if per_step > 0:
            best = min(best, per_step)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("nx", type=int)
    ap.add_argument("pot", choices=["lj", "eam"])
    ap.add_argument("--steps", type=int, default=10, help="steps per block")
    ap.add_argument("--short", type=int, default=2)
    ap.add_argument("--long", type=int, default=5)
    ap.add_argument("--quick", action="store_true",
                    help="3 sweep forms x 2 chunks instead of the full grid")
    args = ap.parse_args()

    base = dict(
        nx=args.nx, ny=args.nx, nz=args.nx, doeam=args.pot == "eam",
        temperature=600.0,
        dtype=os.environ.get("BENCH_DTYPE", "float32"),
        max_atoms=int(os.environ.get("BENCH_MAXATOMS", "0")),
        cell_mode=os.environ.get("BENCH_CELLMODE", "auto"),
        pot_dir=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "pots"),
    )
    probe = init_simulation(Config(**base))
    A = probe.cfg.max_atoms
    n = probe.n_global
    print(f"# autotune: {n} atoms, A={A}, grid={probe.geom.grid}, "
          f"dtype={base['dtype']}", flush=True)
    del probe

    results = []
    for impl, chunk in candidates(args.quick):
        cfg = make_cfg(base, impl, chunk)
        t0 = time.time()
        try:
            per_step = time_config(cfg, args.steps, args.short, args.long)
        except Exception as e:  # OOM / compile failure = not a candidate
            print(f"{impl:<10} C={chunk:<5} FAILED ({type(e).__name__})",
                  flush=True)
            continue
        if not (per_step < float("inf")):  # both marginals corrupted
            print(f"{impl:<10} C={chunk:<5} UNMEASURABLE (relay noise; "
                  f"re-run)", flush=True)
            continue
        results.append((per_step, impl, chunk))
        print(f"{impl:<10} C={chunk:<5} {per_step*1e3:9.2f} ms/step "
              f"({n/per_step:.3e} atom-steps/s)  [{time.time()-t0:.0f}s]",
              flush=True)

    if not results:
        print("no candidate succeeded", file=sys.stderr)
        sys.exit(1)
    results.sort()
    best, impl, chunk = results[0]
    print(f"\n# BEST: {impl} box_chunk={chunk} "
          f"-> {best*1e3:.2f} ms/step ({n/best:.3e} atom-steps/s)")
    if impl in HALF:
        fetch, mat = HALF[impl]
        print(f"# CLI:  --halfShell --halfFetch {fetch}"
              + (" --halfMaterialize" if mat else "")
              + f" --boxChunk {chunk}")
    else:
        print(f"# CLI:  --sweepImpl {impl} --boxChunk {chunk}")
    # the auto-policy comparison must see the RESOLVED capacity (the
    # candidates run with auto max_atoms, resolved to A by plan_cells)
    auto = Config(**{**base, "max_atoms": A})
    print(f"# auto policy would pick: sweep_impl={auto.resolved_sweep_impl} "
          f"box_chunk={auto.resolved_box_chunk}"
          + ("  (MATCHES)" if (auto.resolved_sweep_impl == impl
                               and auto.resolved_box_chunk == chunk)
             else "  (DIFFERS -- consider overriding)"))


if __name__ == "__main__":
    main()
