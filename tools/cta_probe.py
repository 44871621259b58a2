import sys, time
sys.setrecursionlimit(200000)
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import comd_tpu
from comd_tpu import cells
from comd_tpu.potentials.lj import init_lj_pot
from comd_tpu.ops.pallas.lj_cell import lj_force_pallas
from comd_tpu.ops import force_lj
T0=time.time()
def log(m): print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)
pot = init_lj_pot()
ext = np.array([32,32,32])*3.615
geom = cells.make_geometry(np.zeros(3), ext, pot.cutoff*1.1)
B, A = geom.n_total, 32
rng = np.random.default_rng(0)
r = np.full((3, B, A), 1e10, np.float32)
for b in range(geom.n_local):
    t = geom.tuple_of_box[b]; lo = t * geom.box_size
    r[:, b, :20] = lo[:, None] + rng.uniform(0,1,(3,20))*geom.box_size[:, None]
r = jnp.asarray(r)
f_pal = jax.jit(lambda r: lj_force_pallas(geom, pot, r, chunk=256)[2])
f_xla = jax.jit(lambda r: force_lj.lj_force(geom, pot, r, chunk=256)[2])
e1 = float(f_pal(r)); log(f"pallas compile+run OK e={e1:.3f}")
e0 = float(f_xla(r)); log(f"xla e={e0:.3f}  reldiff={(abs(e1-e0)/abs(e0)):.2e}")
def marginal(name, fn):
    fs = jax.jit(lambda r: jax.lax.scan(lambda c,_: (c*0+fn(c*0+r)*0+c, ()), r*0+r, None, length=2)[0])
    # simpler: time repeated calls via scan of force adding into carry
    def mk(n):
        def blk(rr):
            def body(c, _):
                e = fn(c)
                return c + 1e-30*e, ()
            return jax.lax.scan(body, rr, None, length=n)[0]
        return jax.jit(blk)
    f2, f10 = mk(2), mk(10)
    float(jnp.sum(f2(r))); float(jnp.sum(f10(r)))
    best=1e30
    for _ in range(2):
        t0=time.time(); float(jnp.sum(f2(r))); ts=time.time()-t0
        t0=time.time(); float(jnp.sum(f10(r))); tl=time.time()-t0
        best=min(best,(tl-ts)/8)
    log(f"{name:10s} {best*1e3:8.3f} ms/force")
marginal("pallas", lambda rr: f_pal.__wrapped__(rr) if hasattr(f_pal,'__wrapped__') else lj_force_pallas(geom, pot, rr, chunk=256)[2])
marginal("xla", lambda rr: force_lj.lj_force(geom, pot, rr, chunk=256)[2])
