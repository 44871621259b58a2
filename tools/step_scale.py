import sys, time
sys.path.insert(0, '/root/repo')
import jax, numpy as np
import comd_tpu
from comd_tpu import Config
from comd_tpu.sim import init_simulation
def log(m): print(f'[{time.time()-T0:7.1f}s] {m}', flush=True)
T0=time.time()
n = int(sys.argv[1]); doeam = sys.argv[2]=='eam'
cfg = Config(nx=n, ny=n, nz=n, doeam=doeam, temperature=600.0,
             dtype='float32', max_atoms=32, box_chunk=256, pot_dir='/root/repo/pots')
sim = init_simulation(cfg)
log(f'init done atoms={sim.n_global}')
sim.step_block(5); sim.state.e_potential.block_until_ready()
log('warmup scan-5 done')
for rep in range(3):
    t0=time.time()
    sim.step_block(5)
    sim.state.e_potential.block_until_ready()
    w=time.time()-t0
    log(f'5 steps {w:.3f}s -> {sim.n_global*5/w:.3e} atom-steps/s')
log(f'ePot/atom {sim.e_potential/sim.n_global:.6f} atoms {sim.sum_atoms()}')
