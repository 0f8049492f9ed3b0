"""TPU compute kernels (Pallas) and kernel-backed ops."""

from genjax_tpu.ops.logmatmul import (
    log_matmul,
    log_matmul_jnp,
    log_matmul_pallas,
)
from genjax_tpu.ops.mxu import mxu_dot

__all__ = ["log_matmul", "log_matmul_jnp", "log_matmul_pallas", "mxu_dot"]
