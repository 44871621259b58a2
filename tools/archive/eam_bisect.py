"""Bisect the n=32 EAM TPU fault: which piece of eam_force crashes?

Runs progressively larger pieces, each as its own jitted call with a real
D2H sync, printing PASS/FAIL per stage.  Usage: eam_bisect.py [nx] [chunk]
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
from comd_tpu.potentials.eam import init_eam_pot  # noqa: E402
from comd_tpu.ops import binning, force_eam, sweep  # noqa: E402
from comd_tpu.potentials import tables  # noqa: E402

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def stage(name, fn, *args):
    try:
        out = fn(*args)
        val = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        log(f"PASS {name}  (sum {val:.3e})")
        return True
    except Exception as e:
        log(f"FAIL {name}: {type(e).__name__}: {str(e)[:120]}")
        return False


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    pot = init_eam_pot("/root/repo/pots", "Cu_u6.eam", "funcfl")
    ext = np.array([n, n, n]) * 3.615
    geom = cells.make_geometry(np.zeros(3), ext, pot.cutoff * 1.1)
    B, A = geom.n_total, 32
    rng = np.random.default_rng(0)
    r = np.full((3, B, A), 1e10, np.float32)
    # ~14 atoms per local cell at plausible coords
    for b in range(geom.n_local):
        t = geom.tuple_of_box[b]
        lo = t * geom.box_size
        k = 14
        r[:, b, :k] = (lo[:, None] +
                       rng.uniform(0, 1, (3, k)) * geom.box_size[:, None])
    r = jnp.asarray(r)
    log(f"boxes={geom.n_local} chunk={chunk}")

    dtype = r.dtype
    rcut2 = pot.cutoff ** 2
    eval_phi, eval_rho = force_eam.make_evaluators(pot, dtype, False)
    pair1 = force_eam.make_pair1(eval_phi, eval_rho)

    # 1: pass1 force only
    f1 = jax.jit(lambda r: sweep.cell_pair_sweep(
        geom, r, pair1, rcut2, chunk=chunk)[0])
    if not stage("pass1 force", f1, r):
        return

    # 2: pass1 force + scalars
    f2 = jax.jit(lambda r: sweep.cell_pair_sweep(
        geom, r, pair1, rcut2, chunk=chunk))
    if not stage("pass1 force+scalars", f2, r):
        return

    # 3: + embedding interp (f32)
    f_dev = pot.f.values_device(dtype)

    def emb(r):
        _f, (phi, rho) = sweep.cell_pair_sweep(geom, r, pair1, rcut2,
                                               chunk=chunk)
        fe, dfe = tables.interpolate(f_dev, pot.f.n, pot.f.x0,
                                     pot.f.inv_dx, rho)
        return fe
    if not stage("pass2 embed f32", jax.jit(emb), r):
        return

    # 4: + f64 energy reduction
    def e64(r):
        _f, (phi, rho) = sweep.cell_pair_sweep(geom, r, pair1, rcut2,
                                               chunk=chunk)
        fe, _ = tables.interpolate(f_dev, pot.f.n, pot.f.x0, pot.f.inv_dx,
                                   rho)
        u = 0.5 * phi.astype(jnp.float64) + fe.astype(jnp.float64)
        return jnp.sum(u)
    if not stage("f64 energy sum", jax.jit(e64), r):
        return

    # 5: full eam_force
    fill = functools.partial(binning.fill_halo_scalar_serial, geom)
    full = jax.jit(lambda r: force_eam.eam_force(geom, pot, r, fill,
                                                 chunk=chunk))
    stage("full eam_force", full, r)


if __name__ == "__main__":
    main()
