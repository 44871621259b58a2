"""Real-TPU validation of the kernel-initiated (comm_ki analog) transports.

Interpret mode cannot discharge multi-axis remote DMAs (see
tests/test_pallas_comm.py), so the FULL 3-stage ki paths -- atom exchange +
dfEmbed exchange, with use_barrier=True -- are validated here on hardware:
a 1x1x1 mesh makes every push a self-ring remote copy through the real ICI
machinery (barrier semaphores, DMA semaphores, Mosaic lowering all live).

Run:  ./tools/tpu_gate.sh python tools/tpu_ki_test.py
Pass criteria printed per transport; recorded in docs/BENCHMARKS.md.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from comd_tpu.config import Config  # noqa: E402
from comd_tpu.parallel.sharded import init_sharded_simulation  # noqa: E402


def run(comm_impl, steps=10):
    cfg = Config(doeam=True, nx=8, ny=8, nz=8, n_steps=steps,
                 dtype="float32", xproc=1, yproc=1, zproc=1,
                 comm_impl=comm_impl, pot_dir="/root/repo/pots")
    t0 = time.time()
    # init_simulation would route 1x1x1 to the serial path; force the
    # sharded machinery so the ki transports actually run (self-ring)
    sim = init_sharded_simulation(cfg)
    sim.step_block(steps)
    e_pot = sim.e_potential
    e_kin = sim.kinetic_energy()
    r = np.asarray(sim.state.r)
    print(f"[{comm_impl:>10}] ePot/atom={e_pot / sim.n_global:.9f} "
          f"eTot/atom={(e_pot + e_kin) / sim.n_global:.9f} "
          f"atoms={sim.sum_atoms()} ({time.time() - t0:.1f}s)", flush=True)
    return e_pot, e_kin, r


def main():
    ref = run("collective")
    ok = True
    for impl in ("ki", "ki_fused"):
        got = run(impl)
        de = abs(got[0] - ref[0]) / abs(ref[0])
        dr = float(np.max(np.abs(got[2] - ref[2])))
        # ki ships identical payloads -> bitwise; ki_fused computes the
        # plane dF in-kernel (Mosaic lowering may contract differently)
        tol_e, tol_r = (0.0, 0.0) if impl == "ki" else (1e-6, 1e-4)
        status = "OK" if (de <= tol_e and dr <= tol_r) else "FAIL"
        ok &= status == "OK"
        print(f"  {impl} vs collective: |dE|/E={de:.2e} "
              f"max|dr|={dr:.2e} -> {status}", flush=True)
    print("KI TRANSPORT VALIDATION:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
