"""Profiler + determinism helpers (SURVEY.md §5 tracing/sanitizer rows).

The reference's observability is CUDA-event timing and
``CUDA_LAUNCH_BLOCKING=1`` sync debugging (reference 02 notebook cell 0)
plus ``manual_seed``/``cudnn.benchmark=False`` determinism knobs (cell 2).
TPU-native equivalents:

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace; module boundaries show up as named scopes
  (see :func:`vit_tpu.utils.tracing.tensor_info`).
- :func:`deterministic` — context manager forcing deterministic XLA
  reductions + Pallas interpreter mode, the closest analogue of running
  under a sanitizer: slow, but bit-reproducible and bounds-checked.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vit_tpu_trace"):
    """Profile the enclosed block: ``with trace('/tmp/t'): fwd(...)``.

    View with TensorBoard's profile plugin or xprof.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def deterministic():
    """Run the enclosed block with interpreted (bounds-checked) Pallas
    kernels and fast-math disabled for any XLA backend initialized inside
    the block.

    CAVEAT: ``XLA_FLAGS`` is parsed once at backend initialization, so the
    fast-math knob only takes effect if this context manager wraps the FIRST
    jax computation of the process. After init, the effective guarantee is
    the interpreter-mode env var (which vit_tpu.ops.dispatch reads per call)
    — still bit-reproducible for every pallas op, but XLA-compiled ops keep
    whatever flags the backend started with.
    """
    old_flags = os.environ.get("XLA_FLAGS", "")
    old_interp = os.environ.get("VIT_TPU_INTERPRET")
    if "--xla_cpu_enable_fast_math" not in old_flags:
        os.environ["XLA_FLAGS"] = (
            old_flags + " --xla_cpu_enable_fast_math=false").strip()
    os.environ["VIT_TPU_INTERPRET"] = "1"
    try:
        yield
    finally:
        os.environ["XLA_FLAGS"] = old_flags
        if old_interp is None:
            os.environ.pop("VIT_TPU_INTERPRET", None)
        else:
            os.environ["VIT_TPU_INTERPRET"] = old_interp
