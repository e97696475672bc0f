"""vit_tpu — a TPU-native Vision Transformer inference stack.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
``cmeraki/vit.triton`` (a Triton-kernel ViT for CUDA GPUs; see SURVEY.md):

- :mod:`vit_tpu.ops`      — Pallas TPU kernel library (the reference's
  ``vit/kernels/`` tier: add, layernorm, softmax, fused linear matmul,
  batched attention matmul, patch embedding, patching) plus a fused
  flash-attention kernel the reference only planned (reference README.md:27).
- :mod:`vit_tpu.models`   — the ViT forward graph as a single jit-compiled
  functional program (the reference's torch ``vit/vit.py`` module tree).
- :mod:`vit_tpu.weights`  — HuggingFace ``ViTModel`` weight import with
  coverage + zero-scan verification (reference ``vit/load_weights.py``,
  ``vit/utils.py:45-113``).
- :mod:`vit_tpu.parallel` — mesh/sharding entry points (batch-DP + TP over
  ICI); the reference is single-GPU-only, this is the TPU-idiomatic
  expression of "scale throughput".
- :mod:`vit_tpu.utils`    — tracing/timing harnesses (reference
  ``vit/utils.py``: ``tensor_info``, ``timed``, ``benchmark``).
- :mod:`vit_tpu.bench`    — per-kernel and end-to-end benchmark harness
  emitting the reference's ``benchmarks/<name>/Performance.csv`` artifacts.
- :mod:`vit_tpu.train`    — jitted AdamW train step over the differentiable
  (custom-VJP) kernel tier; DP/TP sharding via ``mesh=``.
- :mod:`vit_tpu.serving`  — bucketed fixed-shape serving (compile-once
  replay), single-chip or mesh fan-out.
- :mod:`vit_tpu.quant`    — int8 quantized inference tier (docs/QUANT.md).
"""

from vit_tpu.config import ViTConfig, VARIANTS

__version__ = "0.3.0"

__all__ = ["ViTConfig", "VARIANTS", "__version__"]
