"""Multi-device execution (mesh + shardings).

The reference has no distributed layer at all (SURVEY.md §2.6: single GPU,
hardcoded 'cuda:0'). This package is the TPU-idiomatic expression of "scale
throughput": a device mesh with XLA GSPMD shardings — batch data-parallelism
over the 'data' axis and Megatron-style tensor-parallelism over the 'model'
axis — with all collectives inserted by XLA and riding ICI.
"""

from vit_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicate,
)

__all__ = ["make_mesh", "param_shardings", "batch_sharding", "replicate"]
