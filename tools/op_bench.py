"""Marginal-cost timing of individual step components on the TPU.

Each op is wrapped in a lax.scan that feeds results back into the carry (so
nothing is DCE'd), timed at two scan lengths, and reported as the marginal
per-iteration cost.  Usage: python tools/op_bench.py [nx] [ops...]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import comd_tpu  # noqa: E402
from comd_tpu import Config, cells  # noqa: E402
from comd_tpu.sim import init_simulation  # noqa: E402
from comd_tpu.ops import binning, force_lj, force_eam, sweep  # noqa: E402

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def marginal(name, scan_fn, init, short=3, long=15):
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
    log(f"{name:24s} {best*1e3:9.3f} ms/iter")
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ops = sys.argv[2:] or ["lj", "lj_dense", "eam_dense", "rebucket", "halo"]
    cfg = Config(nx=n, ny=n, nz=n, temperature=600.0, dtype="float32",
                 max_atoms=32, box_chunk=256, pot_dir="/root/repo/pots")
    sim = init_simulation(cfg)
    geom, pot = sim.geom, sim.pot
    st = sim.state
    ext = sim.global_extent
    log(f"init atoms={sim.n_global} boxes={geom.n_local}")

    rcut2 = pot.cutoff ** 2
    pair_fn = force_lj.make_lj_pair_fn(pot, st.r.dtype)

    if "lj" in ops:
        def scan_lj(r, length):
            def body(r, _):
                f, _u = sweep.cell_pair_sweep(geom, r, pair_fn, rcut2,
                                              chunk=256)
                return r + 1e-30 * jnp.pad(
                    f, ((0, 0), (0, geom.n_halo), (0, 0))), ()
            return jax.lax.scan(body, r, None, length=length)[0]
        marginal("lj gather sweep", scan_lj, st.r)

    if "lj_dense" in ops:
        def scan_ljd(r, length):
            def body(r, _):
                f, _u = sweep.cell_pair_sweep_dense(geom, r, pair_fn, rcut2,
                                                    chunk=256)
                return r + 1e-30 * jnp.pad(
                    f, ((0, 0), (0, geom.n_halo), (0, 0))), ()
            return jax.lax.scan(body, r, None, length=length)[0]
        marginal("lj dense-slice sweep", scan_ljd, st.r)

    if "eam_dense" in ops or "eam" in ops:
        from comd_tpu.potentials.eam import init_eam_pot
        epot = init_eam_pot("/root/repo/pots", "Cu_u6.eam", "funcfl")
        fill = functools.partial(binning.fill_halo_scalar_serial, geom)
        ercut2 = epot.cutoff ** 2
        eval_phi, eval_rho = force_eam.make_evaluators(epot, st.r.dtype, False)
        p1 = force_eam.make_pair1(eval_phi, eval_rho)
        which = sweep.cell_pair_sweep_dense if "eam_dense" in ops \
            else sweep.cell_pair_sweep

        def scan_eam1(r, length):
            def body(r, _):
                f, _s = which(geom, r, p1, ercut2, chunk=256)
                return r + 1e-30 * jnp.pad(
                    f, ((0, 0), (0, geom.n_halo), (0, 0))), ()
            return jax.lax.scan(body, r, None, length=length)[0]
        marginal("eam pass1 (interp)", scan_eam1, st.r)

    if "geom" in ops:
        # geometry-only sweep: pair_fn does ONE op beyond dr/r2/mask/reduce.
        # If this costs ~as much as a full EAM pass, the wall is the pair
        # tensor plumbing (gather, dr, reduce), not the table chains.
        def geom_pair(r2, mask, sj, si):
            return mask.astype(r2.dtype), []

        def scan_geom(r, length):
            def body(r, _):
                f, _s = sweep.cell_pair_sweep(geom, r, geom_pair, rcut2,
                                              chunk=256)
                return r + 1e-30 * jnp.pad(
                    f, ((0, 0), (0, geom.n_halo), (0, 0))), ()
            return jax.lax.scan(body, r, None, length=length)[0]
        marginal("geometry-only sweep", scan_geom, st.r)

    if "eam1_cheb" in ops or "eam3_cheb" in ops or "eam_stencil" in ops \
            or "eam_stencil_half" in ops:
        from comd_tpu.potentials.eam import init_eam_pot
        epot2 = init_eam_pot("/root/repo/pots", "Cu_u6.eam", "funcfl")
        ercut2b = epot2.cutoff ** 2
        ev_phi, ev_rho = force_eam.make_evaluators(
            epot2, st.r.dtype, False, impl="cheb")

    if "eam1_cheb" in ops:
        p1c = force_eam.make_pair1(ev_phi, ev_rho, want_energy=False)

        def scan_e1c(r, length):
            def body(r, _):
                f, _s = sweep.cell_pair_sweep(geom, r, p1c, ercut2b,
                                              chunk=256)
                return r + 1e-30 * jnp.pad(
                    f, ((0, 0), (0, geom.n_halo), (0, 0))), ()
            return jax.lax.scan(body, r, None, length=length)[0]
        marginal("eam pass1 cheb (no E)", scan_e1c, st.r)

    if "eam3_cheb" in ops:
        p3c = force_eam.make_pair3(ev_rho)
        dfe = jnp.ones((geom.n_total, st.r.shape[-1]), st.r.dtype)

        def scan_e3c(r, length):
            def body(r, _):
                f, _s = sweep.cell_pair_sweep(geom, r, p3c, ercut2b,
                                              chunk=256, scalar_j=[dfe])
                return r + 1e-30 * jnp.pad(
                    f, ((0, 0), (0, geom.n_halo), (0, 0))), ()
            return jax.lax.scan(body, r, None, length=length)[0]
        marginal("eam pass3 cheb", scan_e3c, st.r)

    if "eam_stencil" in ops or "eam_stencil_half" in ops:
        from comd_tpu.ops.pallas import stencil as stc
        half = "eam_stencil_half" in ops

        def scan_st(r, length):
            def body(r, _):
                f, _p, _rh = stc.eam_pass1_stencil(
                    geom, epot2, r, chunk=512, want_energy=False, half=half)
                pad_to = geom.n_total - f.shape[1]
                return r + 1e-30 * jnp.pad(
                    f, ((0, 0), (0, pad_to), (0, 0))), ()
            return jax.lax.scan(body, r, None, length=length)[0]
        marginal(f"eam pass1 stencil{' half' if half else ''}",
                 scan_st, st.r)

    if "pass2" in ops:
        from comd_tpu.potentials.eam import init_eam_pot
        epot3 = init_eam_pot("/root/repo/pots", "Cu_u6.eam", "funcfl")
        eval_f = force_eam.make_f_eval(epot3, st.r.dtype, "twolevel")
        rho0 = jnp.abs(st.r[0, :geom.n_local]) * 1e-10 + 0.5

        def scan_p2(rho, length):
            def body(rho, _):
                f, df = eval_f(rho)
                return rho + 1e-30 * df, ()
            return jax.lax.scan(body, rho, None, length=length)[0]
        marginal("pass2 F(rhobar) twolevel", scan_p2, rho0)

    if "halo_scalar" in ops:
        dfe0 = jnp.ones((geom.n_total, st.r.shape[-1]), st.r.dtype)

        def scan_hs(dfe, length):
            def body(dfe, _):
                out = binning.fill_halo_scalar_serial(geom, dfe)
                return dfe + 1e-30 * out, ()
            return jax.lax.scan(body, dfe, None, length=length)[0]
        marginal("dfEmbed halo fill", scan_hs, dfe0)

    if "rebucket" in ops:
        def scan_rb(carry, length):
            r, p, gid, na = carry
            def body(c, _):
                r, p, gid, na = c
                r2, p2, g2, n2, _nm, _ov = binning.rebucket(
                    geom, r, p, gid, na, wrap_extent=ext)
                return (r2, p2, g2, n2), ()
            (r, p, gid, na), _ = jax.lax.scan(body, (r, p, gid, na), None,
                                              length=length)
            return r
        marginal("rebucket (sort+scatter)", scan_rb,
                 (st.r, st.p, st.gid, st.n_atoms))

    if "halo" in ops:
        def scan_halo(r, length):
            def body(r, _):
                r2, _g, _n = binning.fill_halo_serial(geom, r, st.gid,
                                                      st.n_atoms)
                return r2, ()
            return jax.lax.scan(body, r, None, length=length)[0]
        marginal("halo fill", scan_halo, st.r)

    if "sort_cells" in ops:
        def scan_sc(carry, length):
            r, p, gid = carry
            def body(c, _):
                return binning.sort_cells(*c), ()
            out, _ = jax.lax.scan(body, (r, p, gid), None, length=length)
            return out[0]
        marginal("sort_cells (in-cell)", scan_sc, (st.r, st.p, st.gid))

    log("done")


if __name__ == "__main__":
    main()
