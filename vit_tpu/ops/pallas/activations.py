"""In-kernel activation functions.

TPU-native equivalent of reference vit/kernels/activations.py:8-20 — the
exact-erf GELU device function inlined into the matmul epilogue
(reference matmul.py:104-106). In Pallas any traceable jnp function works
inside a kernel, so this is a plain function; it exists as a module to keep
one shared definition between kernels and to mirror the reference's library
surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x: jax.Array) -> jax.Array:
    """Exact erf-form GELU: 0.5 * x * (1 + erf(x / sqrt(2))).

    Same formula as the jnp oracle (vit_tpu/ops/reference.py) — kept
    identical so fused epilogues are bit-compatible with the unfused path.
    """
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))
