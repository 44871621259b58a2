"""Side-by-side: exact probe3 formulation vs interpolate_twolevel, same T2."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import comd_tpu
from comd_tpu.potentials import tables
from comd_tpu.potentials.eam import init_eam_pot

N = 256 * 32 * 864
T0 = time.time()
def log(m): print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)

def marginal(name, fn, *xs):
    f_s = jax.jit(lambda *xs: jax.lax.scan(lambda c, _: (fn(*c), ()), xs, None, length=2)[0])
    f_l = jax.jit(lambda *xs: jax.lax.scan(lambda c, _: (fn(*c), ()), xs, None, length=10)[0])
    float(jnp.sum(f_s(*xs)[0])); float(jnp.sum(f_l(*xs)[0]))
    best = 1e30
    for _ in range(2):
        t0=time.time(); float(jnp.sum(f_s(*xs)[0])); ts=time.time()-t0
        t0=time.time(); float(jnp.sum(f_l(*xs)[0])); tl=time.time()-t0
        best = min(best, (tl-ts)/8)
    log(f"{name:34s} {best*1e3:9.3f} ms/iter")

def main():
    pot = init_eam_pot("/root/repo/pots", "Cu_u6.eam", "funcfl")
    tab = pot.phi
    T2np, nb = tables.pack_twolevel([pot.phi, pot.rho], block_rows=8)
    T2 = jnp.asarray(T2np, dtype=jnp.float32)
    br, ntabs = 8, 2
    rng = np.random.default_rng(0)

    # probe3-exact: pre-shaped [1733, 4096] input of RAW INDEX-SPACE x,
    # single output
    x2d = jnp.asarray(rng.uniform(0, tab.n - 2, N).astype(np.float32)
                      ).reshape(-1, 4096)
    def p3(xx):
        def body(xr):
            ii = jnp.floor(xr).astype(jnp.int32)
            u = xr - jnp.floor(xr)
            hi = ii >> 3
            lo = ii & 7
            oh = (hi[:, None] == jnp.arange(nb)[None, :]).astype(jnp.float32)
            fetched = oh @ T2
            sel = (lo[:, None] == jnp.arange(br)[None, :]).astype(jnp.float32)
            vals = jnp.sum(fetched.reshape(-1, br, 8) * sel[:, :, None], axis=1)
            f1 = vals[:,1] + 0.5*u*((vals[:,2]-vals[:,0]) + u*(vals[:,2]+vals[:,0]-2*vals[:,1]))
            f2 = vals[:,5] + 0.5*u*((vals[:,6]-vals[:,4]) + u*(vals[:,6]+vals[:,4]-2*vals[:,5]))
            return xr + 1e-12*(f1 + f2)
        return (jax.lax.map(body, xx),)
    marginal("p3-exact (default prec)", p3, x2d)

    # p3 with precision=HIGHEST
    def p3h(xx):
        def body(xr):
            ii = jnp.floor(xr).astype(jnp.int32)
            u = xr - jnp.floor(xr)
            hi = ii >> 3
            lo = ii & 7
            oh = (hi[:, None] == jnp.arange(nb)[None, :]).astype(jnp.float32)
            fetched = jax.lax.dot(oh, T2, precision=jax.lax.Precision.HIGHEST)
            sel = (lo[:, None] == jnp.arange(br)[None, :]).astype(jnp.float32)
            vals = jnp.sum(fetched.reshape(-1, br, 8) * sel[:, :, None], axis=1)
            f1 = vals[:,1] + 0.5*u*((vals[:,2]-vals[:,0]) + u*(vals[:,2]+vals[:,0]-2*vals[:,1]))
            f2 = vals[:,5] + 0.5*u*((vals[:,6]-vals[:,4]) + u*(vals[:,6]+vals[:,4]-2*vals[:,5]))
            return xr + 1e-12*(f1 + f2)
        return (jax.lax.map(body, xx),)
    marginal("p3 + HIGHEST", p3h, x2d)

    # current implementation on pre-shaped 2D input, same radii domain
    r2d = jnp.asarray(rng.uniform(1.0, 5.4, N).astype(np.float32)).reshape(-1, 4096)
    def cur(rr):
        (phi, dphi), (rho, drho) = tables.interpolate_twolevel(
            T2, nb, br, ntabs, tab.n, tab.x0, tab.inv_dx, rr, batch=4096)
        return (rr + 1e-12*(phi + dphi + rho + drho),)
    marginal("interpolate_twolevel 2D in", cur, r2d)

if __name__ == "__main__":
    main()
