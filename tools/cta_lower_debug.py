import sys
sys.setrecursionlimit(3000)
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import comd_tpu
from comd_tpu import cells
from comd_tpu.potentials.lj import init_lj_pot
from comd_tpu.ops.pallas.lj_cell import lj_force_pallas

# instrument Mosaic's convert helper
from jax._src.pallas.mosaic import lowering as ml
orig = ml._convert_helper
depth = [0]
def wrapped(x, *, to_dtype):
    if depth[0] < 6:
        print(f"convert_helper: {x.type if hasattr(x,'type') else x} -> {to_dtype}", flush=True)
    depth[0] += 1
    if depth[0] > 50:
        raise SystemExit("convert loop confirmed; see prints above")
    try:
        return orig(x, to_dtype=to_dtype)
    finally:
        depth[0] -= 1
ml._convert_helper = wrapped

pot = init_lj_pot()
ext = np.array([12,12,12])*3.615
geom = cells.make_geometry(np.zeros(3), ext, pot.cutoff*1.1)
B, A = geom.n_total, 32
r = jnp.zeros((3, B, A), jnp.float32)
try:
    jax.jit(lambda r: lj_force_pallas(geom, pot, r, chunk=64)[2]).lower(r)
    print("LOWER OK")
except Exception as e:
    print("ERR", type(e).__name__, str(e)[:300])
