"""Implementation dispatch for the op library.

Every public op in :mod:`vit_tpu.ops` has two implementations:

- ``"xla"``    — pure jnp (vit_tpu/ops/reference.py), fused by XLA under jit.
- ``"pallas"`` — hand-written Pallas TPU kernel (vit_tpu/ops/pallas/*), the
  TPU-native equivalent of the reference's Triton kernel tier
  (reference vit/kernels/).

Resolution order for ``impl=None``:

1. ``VIT_TPU_IMPL`` environment variable ("xla" | "pallas"), set e.g. by the
   test suite or benchmark harness;
2. ``"pallas"`` when the default JAX backend is a TPU, else ``"xla"``.

Pallas kernels additionally honor ``VIT_TPU_INTERPRET=1`` (or a non-TPU
backend) by running in interpreter mode — the CPU "fake backend" the
reference lacks (SURVEY.md §4).
"""

from __future__ import annotations

import os

import jax

VALID_IMPLS = ("xla", "pallas")


def _backend() -> str:
    # Deliberately uncached: callers like __graft_entry__.dryrun_multichip
    # switch platforms mid-process via clear_backends(), and a cached value
    # would keep selecting compiled pallas on a CPU backend. default_backend()
    # is cheap once the backend is initialized.
    return jax.default_backend()


def resolve_impl(impl: str | None = None) -> str:
    if impl is None:
        impl = os.environ.get("VIT_TPU_IMPL") or None
    if impl is None:
        impl = "pallas" if _backend() == "tpu" else "xla"
    if impl not in VALID_IMPLS:
        raise ValueError(f"impl must be one of {VALID_IMPLS}, got {impl!r}")
    return impl


def interpret_mode(interpret: bool | None = None) -> bool:
    """Whether Pallas kernels should run under the interpreter."""
    if interpret is not None:
        return interpret
    if os.environ.get("VIT_TPU_INTERPRET", "") not in ("", "0"):
        return True
    return _backend() != "tpu"
