"""Two-level one-hot lookup probe (XLA level).

fetched = onehot(hi) [N, nb] @ T2 [nb, br*8]; row-select among br via a
mask-weighted sum. If XLA fuses the epilogue, this should run at multiple
G-lookups/s on the MXU.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

N = 256 * 32 * 864
NTAB = 512
T0 = time.time()
def log(m): print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)

def marginal(name, fn, x):
    try:
        f_s = jax.jit(lambda x: jax.lax.scan(lambda c, _: (fn(c), ()), x, None, length=2)[0])
        f_l = jax.jit(lambda x: jax.lax.scan(lambda c, _: (fn(c), ()), x, None, length=10)[0])
        float(jnp.sum(f_s(x))); float(jnp.sum(f_l(x)))
        best = 1e30
        for _ in range(2):
            t0=time.time(); float(jnp.sum(f_s(x))); ts=time.time()-t0
            t0=time.time(); float(jnp.sum(f_l(x))); tl=time.time()-t0
            best = min(best, (tl-ts)/8)
        log(f"{name:16s} {best*1e3:9.3f} ms per {N/1e6:.1f}M lookups ({N/best/1e9:.2f} G/s)")
    except Exception as e:
        log(f"{name:16s} FAIL {type(e).__name__}: {str(e)[:150]}")

def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, NTAB-2, N).astype(np.float32)).reshape(-1, 4096)
    for nb, br in [(64, 8), (32, 16), (128, 4)]:
        T2 = jnp.asarray(rng.normal(size=(nb, br*8)).astype(np.float32))
        bshift = int(np.log2(br))
        def tl_fn(xx, T2=T2, nb=nb, br=br, bshift=bshift):
            def body(xr):
                ii = jnp.floor(xr).astype(jnp.int32)
                u = xr - jnp.floor(xr)
                hi = ii >> bshift
                lo = ii & (br-1)
                oh = (hi[:, None] == jnp.arange(nb)[None, :]).astype(jnp.float32)
                fetched = oh @ T2                           # [M, br*8]
                sel = (lo[:, None] == jnp.arange(br)[None, :]).astype(jnp.float32)
                vals8 = jnp.sum(fetched.reshape(-1, br, 8) * sel[:, :, None], axis=1)
                # quadratic combine for 2 tables
                tm1,t0,t1,t2v = vals8[:,0],vals8[:,1],vals8[:,2],vals8[:,3]
                f1 = t0 + 0.5*u*((t1-tm1) + u*(t1+tm1-2*t0))
                rm1,r0,r1,r2v = vals8[:,4],vals8[:,5],vals8[:,6],vals8[:,7]
                f2 = r0 + 0.5*u*((r1-rm1) + u*(r1+rm1-2*r0))
                return xr + 1e-12*(f1 + f2)
            return jax.lax.map(body, xx)
        marginal(f"twolevel {nb}x{br}", tl_fn, x)

if __name__ == "__main__":
    main()
