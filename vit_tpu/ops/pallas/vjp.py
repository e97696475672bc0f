"""Differentiable wrappers for the Pallas kernels (custom VJPs).

The reference is inference-only, so its kernels have no backward story.
Training in this framework defaults to the XLA op path (vit_tpu/train.py) —
but for the Pallas path to be a drop-in under ``jax.grad``, the fused
linear matmul gets a custom VJP here: the backward matmuls (where the FLOPs
are) run on the same Pallas kernel, and the fused-GELU epilogue is handled
by rematerializing the pre-activation (one extra forward matmul — the
standard remat trade: no (M, N) pre-activation buffer is ever saved).

dx = (g * act'(pre)) @ W^T      dW = x^T @ (g * act'(pre))
db = sum_rows(g * act'(pre))    act'(z) = dGELU/dz (erf form)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vit_tpu.ops.pallas.activations import erf
from vit_tpu.ops.pallas.matmul import matmul

_INV_SQRT_2PI = 0.3989422804014327


def gelu_grad(z: jax.Array) -> jax.Array:
    """d/dz [0.5 z (1 + erf(z/sqrt(2)))] = Phi(z) + z phi(z)."""
    phi = _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)
    cdf = 0.5 * (1.0 + erf(z * (2.0 ** -0.5)))
    return cdf + z * phi


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def linear(x: jax.Array, w: jax.Array, b: jax.Array | None,
           activation: str | None = None, interpret: bool = False):
    """Differentiable fused linear: ``act(x @ w + b)`` on the Pallas kernel."""
    return matmul(x, w, b, activation, interpret=interpret)


def _linear_fwd(x, w, b, activation, interpret):
    y = matmul(x, w, b, activation, interpret=interpret)
    return y, (x, w, b)


def _linear_bwd(activation, interpret, res, g):
    x, w, b = res
    k, n = w.shape
    xf = x.reshape(-1, k)
    gf = g.reshape(-1, n)
    if activation == "gelu":
        # Rematerialize the pre-activation with the same fused kernel.
        pre = matmul(x, w, b, None, interpret=interpret).reshape(-1, n)
        gf = (gf.astype(jnp.float32)
              * gelu_grad(pre.astype(jnp.float32))).astype(g.dtype)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    dx = matmul(gf, w.T, interpret=interpret).reshape(x.shape)
    dw = matmul(xf.T, gf, interpret=interpret)
    db = None if b is None else jnp.sum(gf, axis=0).astype(b.dtype)
    return dx, dw, db


linear.defvjp(_linear_fwd, _linear_bwd)
