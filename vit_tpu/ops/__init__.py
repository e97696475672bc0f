"""Public op library — the TPU-native equivalent of reference vit/kernels/.

Export surface mirrors reference vit/kernels/__init__.py:1-7
(``patching, matmul, softmax, add, layernorm, matmul3, conv2d/patch_embed``)
plus the fused ``flash_attention`` the reference only planned
(reference README.md:27 "Add Flash attn").

Every op takes ``impl="xla" | "pallas" | None`` (None = auto, see
:mod:`vit_tpu.ops.dispatch`) and, for the pallas path, ``interpret`` to force
interpreter mode on CPU.
"""

from __future__ import annotations

import jax

from vit_tpu.ops import reference
from vit_tpu.ops.dispatch import interpret_mode, resolve_impl
from vit_tpu.ops.reference import gelu, patchify as _patchify_ref

__all__ = [
    "add", "layernorm", "softmax", "matmul", "matmul3", "fused_linear",
    "patchify", "patch_embed", "flash_attention", "gelu",
    "resolve_impl", "interpret_mode", "reference",
]


def add(x, y, *, impl=None, interpret=None):
    """Elementwise add (reference vit/kernels/add.py equivalent)."""
    if resolve_impl(impl) == "xla":
        return reference.add(x, y)
    from vit_tpu.ops.pallas import vjp as _k
    return _k.add(x, y, interpret_mode(interpret))


def layernorm(x, scale, bias, *, eps=1e-12, impl=None, interpret=None):
    """Row layernorm (reference vit/kernels/layernorm.py equivalent)."""
    if resolve_impl(impl) == "xla":
        return reference.layernorm(x, scale, bias, eps=eps)
    from vit_tpu.ops.pallas import vjp as _k
    return _k.layernorm(x, scale, bias, eps, interpret_mode(interpret))


def softmax(x, *, impl=None, interpret=None):
    """Row softmax over the last axis (reference vit/kernels/softmax.py)."""
    if resolve_impl(impl) == "xla":
        return reference.softmax(x)
    from vit_tpu.ops.pallas import vjp as _k
    return _k.softmax(x, interpret_mode(interpret))


def matmul(x, w, bias=None, activation=None, *, impl=None, interpret=None):
    """(B,M,K)@(K,N) + fused bias + fused GELU (reference vit/kernels/matmul.py).

    The pallas path goes through the custom-VJP wrapper, so ``jax.grad``
    works on it transparently (vit_tpu/ops/pallas/vjp.py).
    """
    if resolve_impl(impl) == "xla":
        return reference.matmul(x, w, bias, activation)
    from vit_tpu.ops.pallas import vjp as _k
    return _k.linear(x, w, bias, activation, interpret_mode(interpret))


def fused_linear(x, w, bias=None, activation=None, *, ln_scale=None,
                 ln_bias=None, eps=1e-12, residual=None, impl=None,
                 interpret=None):
    """``act(LN(x) @ w + bias) + residual`` — the transformer-block fusion.

    Pallas path: one matmul pass with LN prologue (precomputed row stats)
    and residual epilogue (vit_tpu/ops/pallas/matmul.py:fused_linear).
    XLA path: the same math as the unfused op chain — XLA's fusion does the
    equivalent work at the HLO level.
    """
    if resolve_impl(impl) == "xla":
        h = (reference.layernorm(x, ln_scale, ln_bias, eps=eps)
             if ln_scale is not None else x)
        out = reference.matmul(h, w, bias, activation)
        return reference.add(out, residual) if residual is not None else out
    from vit_tpu.ops.pallas import vjp as _k
    return _k.fused_linear(x, w, bias, ln_scale, ln_bias, residual,
                           activation, eps, interpret_mode(interpret))


def matmul3(x, y, *, scale=None, impl=None, interpret=None):
    """(B,M,K)@(B,K,N) + fused scaling (reference vit/kernels/matmul3.py)."""
    if resolve_impl(impl) == "xla":
        return reference.matmul3(x, y, scale=scale)
    from vit_tpu.ops.pallas import vjp as _k
    return _k.matmul3(x, y, scale, interpret_mode(interpret))


def patchify(x, patch_size, *, impl=None, interpret=None):
    """NCHW image -> flattened patch rows (reference vit/kernels/patching.py)."""
    if resolve_impl(impl) == "xla":
        return _patchify_ref(x, patch_size)
    from vit_tpu.ops.pallas import patching as _k
    return _k.patchify(x, patch_size, interpret=interpret_mode(interpret))


def patch_embed(x, w, bias, patch_size, *, impl=None, interpret=None):
    """Patch-embedding conv as unfold+matmul (reference vit/kernels/conv2d.py
    equivalent, via the layout its roadmap targets — SURVEY.md §7)."""
    if resolve_impl(impl) == "xla":
        return reference.patch_embed(x, w, bias, patch_size)
    from vit_tpu.ops.pallas import vjp as _k
    return _k.patch_embed(x, w, bias, patch_size, interpret_mode(interpret))


def flash_attention(q, k, v, *, scale=None, seq_len=None, impl=None,
                    interpret=None):
    """Fused multi-head attention, (B,H,S,d) layout.

    Pallas path is a blockwise online-softmax (flash) kernel; XLA path is the
    unfused scores->softmax->context chain equivalent to the reference's
    matmul3/softmax/matmul3 sequence (reference vit/vit.py:66-72).
    ``seq_len`` marks the real token count for pre-padded operands.
    """
    if resolve_impl(impl) == "xla":
        return reference.attention(q, k, v, scale=scale, seq_len=seq_len)
    from vit_tpu.ops.pallas import vjp as _k
    return _k.attention(q, k, v, scale, seq_len, interpret_mode(interpret))
