"""Single-chip benchmark: EAM Cu atom-step rate (the reference's headline).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "atom-steps/sec/chip", "vs_baseline": N}

vs_baseline is against the north-star 1e8 atom-steps/sec/chip (~100
atoms/us/chip, BASELINE.md) on ~1M-atom EAM Cu.  For context the reference's
recorded 16-GPU 2016 cluster runs reached 1.16e8 atom-steps/s total
(115.96 atoms/us, errors_sync_version/.../out16_80_3.txt).

Timing method: the TPU relay in this environment makes one-off timings
unreliable (see CLAUDE.md), so the rate comes from the difference between a
long and a short scan block (fixed overheads cancel).  The benchmark walks a
fallback chain of configs so a device fault on the big problem still yields
a valid (smaller-problem) measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def wait_healthy(max_tries=10):
    import jax
    import jax.numpy as jnp
    for i in range(max_tries):
        try:
            x = jnp.ones((128, 128))
            assert float((x @ x)[0, 0]) == 128.0
            return True
        except Exception as e:
            log(f"[bench] TPU unhealthy ({type(e).__name__}), retry {i}...")
            time.sleep(30)
    return False


def measure(n_cells: int, doeam: bool, dtype: str, short: int, long: int,
            chunk: int, block: int = 10):
    from comd_tpu import Config
    from comd_tpu.sim import init_simulation

    pots = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pots")
    # max_atoms=0 + cell_mode auto: lattice-commensurate cells with
    # auto-sized capacity.  The 63^3 EAM headline picks cell = 1.5 unit
    # cells (k=3, A=16, 42^3 grid) and the static shifted-slice sweep at
    # chunk=1024 -- the measured-best round-3 config (36.5 ms/step; the
    # k=4 exact-pack 64^3 alternative is 44.4).  63 (not 64) because the
    # k=3 commensurate sizing needs n_cells divisible by 1.5.
    cfg = Config(nx=n_cells, ny=n_cells, nz=n_cells, doeam=doeam,
                 temperature=600.0, dtype=dtype, max_atoms=0,
                 cell_mode=os.environ.get("BENCH_CELLMODE", "auto"),
                 box_chunk=chunk, pot_dir=pots)
    t0 = time.time()
    sim = init_simulation(cfg)
    log(f"[bench] init {n_cells}^3 {'EAM' if doeam else 'LJ'} "
        f"atoms={sim.n_global} cells={sim.cfg.cell_mode} "
        f"A={sim.cfg.max_atoms} in {time.time()-t0:.1f}s")

    # `short`/`long` count printRate-sized blocks of `block` steps, so the
    # energy-reporting step (once per block, the printRate cadence) is
    # included at its true amortized cost in the marginal rate.
    def run(k):
        for _ in range(k):
            sim.step_block(block)
        return float(sim.state.e_potential)

    t0 = time.time()
    run(1)
    log(f"[bench] compiled+warm in {time.time()-t0:.1f}s")

    best = 1e30
    for _ in range(3):
        t0 = time.time()
        run(short)
        ts = time.time() - t0
        t0 = time.time()
        run(long)
        tl = time.time() - t0
        best = min(best, (tl - ts) / ((long - short) * block))
    e_per_atom = sim.e_potential / sim.n_global
    log(f"[bench] {best*1e3:.2f} ms/step  ePot/atom {e_per_atom:.6f}  "
        f"atoms {sim.sum_atoms()}")
    assert sim.sum_atoms() == sim.n_global, "atoms lost"
    return sim.n_global, best


def main():
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    chunk = int(os.environ.get("BENCH_CHUNK", 0))   # 0 = auto by sweep impl
    short = int(os.environ.get("BENCH_SHORT", 2))
    long = int(os.environ.get("BENCH_LONG", 7))
    forced = os.environ.get("BENCH_CELLS")
    # The headline config is the baseline's own: 1M-atom EAM Cu
    # (BASELINE.md north star).  The Chebyshev-in-r^2 evaluators made EAM
    # the fastest table path; opt into LJ with BENCH_POT=lj.
    want_eam = os.environ.get("BENCH_POT", "eam") == "eam"

    attempts = ([(int(forced), want_eam)] if forced else
                ([(63, True), (48, True), (33, True)] if want_eam else
                 [(64, False), (48, False), (32, False)]))

    n_atoms, per_step, label = None, None, None
    for n_cells, doeam in attempts:
        if not wait_healthy():
            continue
        try:
            n_atoms, per_step = measure(n_cells, doeam, dtype, short, long,
                                        chunk)
            label = f"{n_atoms}-atom {'EAM Cu (funcfl)' if doeam else 'LJ'}"
            break
        except Exception as e:
            log(f"[bench] {n_cells}^3 failed: {type(e).__name__}: "
                f"{str(e)[:120]}")
            time.sleep(30)

    if per_step is None:
        print(json.dumps({"metric": "atom-steps/sec/chip (bench failed)",
                          "value": 0.0, "unit": "atom-steps/sec/chip",
                          "vs_baseline": 0.0}))
        return

    rate = n_atoms / per_step
    print(json.dumps({
        "metric": f"atom-steps/sec/chip, {label}, {dtype}, velocity-Verlet "
                  f"incl. redistribution, printRate=10 energy cadence "
                  f"(marginal-block timing)",
        "value": rate,
        "unit": "atom-steps/sec/chip",
        "vs_baseline": rate / 1.0e8,
    }))


if __name__ == "__main__":
    main()
