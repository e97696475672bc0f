"""Developer utilities (the reference's L4 tier, vit/utils.py)."""

from vit_tpu.utils.tracing import tensor_info
from vit_tpu.utils.timing import benchmark_sweep, timed

__all__ = ["tensor_info", "timed", "benchmark_sweep"]
