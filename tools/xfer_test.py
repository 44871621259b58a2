import time, numpy as np, jax

def t(mb):
    x = np.ones((mb * 256 * 1024,), np.float32)  # mb MB
    t0 = time.time(); d = jax.device_put(x); d.block_until_ready(); up = time.time() - t0
    t0 = time.time(); _ = np.asarray(d); down = time.time() - t0
    print(f'{mb:5d} MB: up {up:6.2f}s ({mb/max(up,1e-9):7.1f} MB/s)  '
          f'down {down:6.2f}s ({mb/max(down,1e-9):7.1f} MB/s)', flush=True)

for mb in (1, 4, 16, 64):
    t(mb)
