"""In-kernel activation functions.

TPU-native equivalent of reference vit/kernels/activations.py:8-20 — the
exact-erf GELU device function inlined into the matmul epilogue
(reference matmul.py:104-106).

Mosaic has no ``erf`` lowering, so inside kernels erf is evaluated with the
Abramowitz & Stegun 7.1.26 rational approximation (|error| <= 1.5e-7 —
below fp32 resolution for GELU's input range, so numerically equivalent to
the XLA path's ``lax.erf``; the end-to-end parity tests hold both paths to
the same tolerance). This mirrors what the reference actually runs too:
Triton's ``tl.math.erf`` is itself a polynomial device approximation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Abramowitz & Stegun 7.1.26 coefficients.
_P = 0.3275911
_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def erf(x: jax.Array) -> jax.Array:
    """Elementwise erf via A&S 7.1.26 (odd extension), |err| <= 1.5e-7."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + _P * ax)
    a1, a2, a3, a4, a5 = _A
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def gelu(x: jax.Array) -> jax.Array:
    """Erf-form GELU: 0.5 * x * (1 + erf(x / sqrt(2))).

    Same formula as the jnp oracle (vit_tpu/ops/reference.py); erf evaluated
    per the module docstring.
    """
    return 0.5 * x * (1.0 + erf(x * (2.0 ** -0.5)))
