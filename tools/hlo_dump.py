import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import comd_tpu
from comd_tpu.potentials import tables
from comd_tpu.potentials.eam import init_eam_pot

pot = init_eam_pot("/root/repo/pots", "Cu_u6.eam", "funcfl")
tab = pot.phi
T2np, nb = tables.pack_twolevel([pot.phi, pot.rho], block_rows=8)
T2 = jnp.asarray(T2np, dtype=jnp.float32)

def tl(r):
    (phi, dphi), (rho, drho) = tables.interpolate_twolevel(
        T2, nb, 8, 2, tab.n, tab.x0, tab.inv_dx, r, batch=4096)
    return phi + dphi + rho + drho

x = jnp.zeros((256, 32, 864), jnp.float32)
txt = jax.jit(tl).lower(x).compile().as_text()
open("/tmp/hlo_twolevel.txt", "w").write(txt)
print("lines:", len(txt.splitlines()))
import re
for pat in ["fusion", r"\bcopy", "transpose", r"\bdot\b", "while", "dynamic-slice", "convert"]:
    n = len(re.findall(pat, txt))
    print(f"{pat:15s} {n}")
