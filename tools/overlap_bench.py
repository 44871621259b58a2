"""Measure the -a 1 interior/boundary overlap on a single chip.

A 1x1x1 sharded sim exercises the FULL mesh machinery (staged ppermute
exchanges as self-sends, interior/boundary split sweeps) on one device, so
the marginal step-time difference between gpu_async=0 and gpu_async=1
isolates what the dependency-removal structure buys when XLA schedules the
exchange against interior compute.  (The reference measured this across a
4-transport x N-rank matrix; on one chip the collectives are local copies,
so this bounds the SCHEDULING effect, not ICI latency hiding.)

Usage: ./tools/tpu_gate.sh python tools/overlap_bench.py [nx] [eam|lj] [method]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from comd_tpu import Config  # noqa: E402
from comd_tpu.sim import init_simulation  # noqa: E402


def measure(cfg, short=3, long=15):
    sim = init_simulation(cfg)

    def run(k):
        sim.step_block(k)
        return float(sim.state.e_potential)

    run(short)
    run(long)
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        run(short)
        ts = time.time() - t0
        t0 = time.time()
        run(long)
        tl = time.time() - t0
        best = min(best, (tl - ts) / (long - short))
    return best, sim


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    doeam = (sys.argv[2] if len(sys.argv) > 2 else "eam") == "eam"
    method = sys.argv[3] if len(sys.argv) > 3 else "thread_atom"
    for gpu_async in (0, 1):
        cfg = Config(nx=n, ny=n, nz=n, doeam=doeam, temperature=600.0,
                     dtype="float32", max_atoms=32, box_chunk=256,
                     xproc=1, yproc=1, zproc=1, gpu_async=gpu_async,
                     method=method, pot_dir="/root/repo/pots")
        # force the sharded implementation even at 1x1x1
        from comd_tpu.parallel.sharded import init_sharded_simulation
        import jax
        t0 = time.time()
        sim = init_sharded_simulation(cfg.resolve(), devices=jax.devices()[:1])

        def run(k):
            sim.step_block(k)
            return float(sim.state.e_potential)

        run(3)
        run(15)
        best = 1e30
        for _ in range(3):
            t1 = time.time()
            run(3)
            ts = time.time() - t1
            t1 = time.time()
            run(15)
            tl = time.time() - t1
            best = min(best, (tl - ts) / 12)
        print(f"-a {gpu_async}: {best*1e3:8.2f} ms/step "
              f"({sim.n_global/best:.3e} atom-steps/s) "
              f"ePot/atom={float(sim.e_potential)/sim.n_global:.6f} "
              f"[total incl compile {time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
