"""comd_tpu: a TPU-native classical molecular-dynamics engine.

Rebuild of the capabilities of CoMD-CUDA-Async (CoMD 1.1 + CUDA kernels +
GPUDirect-Async halo exchange) as a JAX/XLA/Pallas program: fixed-capacity
link-cell arrays, a pure jitted step function, shard_map domain decomposition
over a 3D TPU mesh, and Pallas cell-pair force kernels.

f64 support is enabled globally: the reference defaults to double precision
(COMD_DOUBLE, src-mpi/Makefile:12) and the energy-conservation contract
(1e-9 over 100 steps) requires f64 accumulation even when dynamics run f32.
"""
import jax

jax.config.update("jax_enable_x64", True)

from .config import Config  # noqa: E402
from .sim import Simulation, init_simulation  # noqa: E402

__all__ = ["Config", "Simulation", "init_simulation"]
__version__ = "0.1.0"
