"""Half-shell re-trade on the window-fetch sweep (round-4, VERDICT item 2a).

The round-2 half-shell null predates the window fetch: pair-once halves the
~1.12e9 slot-pairs behind the EAM force phase, so re-measure it on the
headline geometry (63^3 EAM auto = k=3/A=16) with the window fetch and the
optional pair-materialization barrier.

Usage:  tools/tpu_gate.sh python tools/half_probe.py [nx] [configs...]
  configs: full | half:<fetch>:<mat>:<chunk>   (default set below)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from comd_tpu import Config
from comd_tpu.sim import init_simulation
from comd_tpu.ops import binning, force_eam
from comd_tpu.ops.sweep import fold_halo_serial

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def marginal(name, scan_fn, init, short=3, long=10):
    f_s = jax.jit(functools.partial(scan_fn, length=short))
    f_l = jax.jit(functools.partial(scan_fn, length=long))
    float(jnp.sum(f_s(init)))  # compile + drain
    float(jnp.sum(f_l(init)))
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        float(jnp.sum(f_s(init)))
        ts = time.time() - t0
        t0 = time.time()
        float(jnp.sum(f_l(init)))
        tl = time.time() - t0
        best = min(best, (tl - ts) / (long - short))
    log(f"{name:40s} {best*1e3:9.3f} ms/iter")
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 63
    configs = sys.argv[2:] or [
        "full", "half:window:0:512", "half:window:0:1024",
        "half:window:1:512", "half:slices:0:512",
    ]
    cfg = Config(nx=n, ny=n, nz=n, doeam=True, temperature=600.0,
                 dtype="float32", max_atoms=0, pot_dir="/root/repo/pots")
    sim = init_simulation(cfg)
    geom, pot, st = sim.geom, sim.pot, sim.state
    log(f"init atoms={sim.n_global} A={sim.cfg.max_atoms} "
        f"grid={geom.grid} sweep={sim.cfg.resolved_sweep_impl} "
        f"chunk={sim.cfg.resolved_box_chunk}")
    fill = functools.partial(binning.fill_halo_scalar_serial, geom)

    def fill2(x, rhobar_l=None):
        return fill(x)

    fold = functools.partial(fold_halo_serial, geom)
    pad_n = geom.n_total - geom.n_local

    for c in configs:
        if c == "full":
            def scan_full(r, length):
                def body(r, _):
                    f, _u, _d = force_eam.eam_force(
                        geom, pot, r.astype(st.r.dtype), fill2,
                        chunk=sim.cfg.resolved_box_chunk,
                        interp_impl="cheb", want_energy=False,
                        sweep_impl=sim.cfg.resolved_sweep_impl)
                    return r + 1e-30 * jnp.pad(
                        f, ((0, 0), (0, pad_n), (0, 0))), ()
                return jax.lax.scan(body, r, None, length=length)[0]
            marginal(f"eam full {sim.cfg.resolved_sweep_impl} "
                     f"C{sim.cfg.resolved_box_chunk}", scan_full, st.r)
        else:
            _, fetch, mat, chunk = c.split(":")
            mat, chunk = bool(int(mat)), int(chunk)

            def scan_half(r, length, fetch=fetch, mat=mat, chunk=chunk):
                def body(r, _):
                    f, _u, _d = force_eam.eam_force_half(
                        geom, pot, r.astype(st.r.dtype), fill2, fold,
                        chunk=chunk, interp_impl="cheb", want_energy=False,
                        fetch=fetch, materialize=mat)
                    return r + 1e-30 * jnp.pad(
                        f, ((0, 0), (0, pad_n), (0, 0))), ()
                return jax.lax.scan(body, r, None, length=length)[0]
            marginal(f"eam half {fetch} mat={int(mat)} C{chunk}",
                     scan_half, st.r)

    log("done")


if __name__ == "__main__":
    main()
