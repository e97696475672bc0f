"""Pallas TPU kernels — the native-kernel tier of the framework.

This is the TPU equivalent of the reference's Triton kernel library
(reference vit/kernels/): one module per kernel, each standalone-runnable
(``python -m vit_tpu.ops.pallas.<kernel> --help``) with an allclose self-test
against the jnp oracle and a perf sweep emitting
``benchmarks/<kernel>/Performance.csv`` — the same developer workflow as the
reference's per-kernel ``__main__`` blocks (SURVEY.md §2.1).

Where the reference autotunes over dozens of Triton configs per kernel
(e.g. 25 configs at reference vit/kernels/matmul.py:10-39), these kernels use
static block heuristics derived from the TPU's fixed tiling (8/16 sublanes x
128 lanes, ~16 MB VMEM) — the hardware's shape is known, so search is
unnecessary.
"""
