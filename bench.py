"""Single-chip benchmark: EAM Cu atom-step rate (the reference's headline).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "atom-steps/sec/chip", "vs_baseline": N}

vs_baseline is measured against the north-star 1e8 atom-steps/sec/chip
(~100 atoms/us/chip, BASELINE.md) on ~1M-atom EAM Cu.  For context the
reference's recorded 16-GPU 2016 cluster runs reached 1.16e8 atom-steps/s
total (115.96 atoms/us, errors_sync_version/.../out16_80_3.txt).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax


def main():
    # size: ~1M atoms (64^3 unit cells * 4) on a real chip; fall back to a
    # smaller problem on CPU so the script stays usable everywhere.
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    n_cells = int(os.environ.get("BENCH_CELLS", 64 if on_tpu else 12))
    steps = int(os.environ.get("BENCH_STEPS", 20 if on_tpu else 5))
    dtype = os.environ.get("BENCH_DTYPE", "float32")

    from comd_tpu import Config
    from comd_tpu.sim import init_simulation

    pots = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pots")
    cfg = Config(nx=n_cells, ny=n_cells, nz=n_cells, doeam=True,
                 temperature=600.0, dtype=dtype, max_atoms=32,
                 box_chunk=int(os.environ.get("BENCH_CHUNK", 512)),
                 pot_dir=pots)
    t0 = time.time()
    sim = init_simulation(cfg)
    init_s = time.time() - t0

    # warmup + compile the exact block we measure (a different scan length
    # would be a second compilation)
    t0 = time.time()
    sim.step_block(steps)
    sim.state.e_potential.block_until_ready()
    compile_s = time.time() - t0

    reps = int(os.environ.get("BENCH_REPS", 3))
    t0 = time.time()
    for _ in range(reps):
        sim.step_block(steps)
    sim.state.e_potential.block_until_ready()
    wall = time.time() - t0

    n = sim.n_global
    rate = n * steps * reps / wall  # atom-steps/sec/chip
    baseline = 1.0e8         # north-star atom-steps/sec/chip
    print(json.dumps({
        "metric": f"atom-steps/sec/chip, {n}-atom EAM Cu (funcfl), "
                  f"{dtype}, velocity-Verlet incl. redistribution",
        "value": rate,
        "unit": "atom-steps/sec/chip",
        "vs_baseline": rate / baseline,
    }))
    print(f"# init {init_s:.1f}s  compile+2steps {compile_s:.1f}s  "
          f"{steps} steps {wall:.2f}s  atoms {n}  "
          f"ePot/atom {sim.e_potential / n:.9f}  "
          f"atoms/us {rate / 1e6:.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
