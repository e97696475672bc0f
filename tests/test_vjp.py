"""Custom VJP of the Pallas fused linear vs jax.grad of the jnp oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.ops import reference as R
from vit_tpu.ops.pallas.vjp import linear


@pytest.mark.parametrize("activation", [None, "gelu"])
@pytest.mark.parametrize("with_bias", [True, False])
def test_linear_grads_match_oracle(rng, activation, with_bias):
    m, k, n = 24, 32, 40
    x = jnp.asarray(rng.standard_normal((2, m, k)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.5, jnp.float32)
    b = jnp.asarray(rng.standard_normal(n) * 0.5, jnp.float32) \
        if with_bias else None

    def loss_pallas(x, w, b):
        return jnp.sum(jnp.sin(linear(x, w, b, activation, True)))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.sin(R.matmul(x, w, b, activation)))

    if with_bias:
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    else:
        gp = jax.grad(loss_pallas, argnums=(0, 1))(x, w, b)
        gr = jax.grad(loss_ref, argnums=(0, 1))(x, w, b)
    for got, want in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)


def test_linear_value_matches_forward(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((16, 24)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(24), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(linear(x, w, b, "gelu", True)),
        np.asarray(R.matmul(x, w, b, "gelu")), atol=1e-5)


def test_ops_matmul_pallas_dispatch_is_differentiable(rng):
    from vit_tpu import ops

    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((16, 24)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(24), jnp.float32)

    def loss(w):
        return jnp.sum(ops.matmul(x, w, b, "gelu", impl="pallas"))

    def loss_ref(w):
        return jnp.sum(ops.matmul(x, w, b, "gelu", impl="xla"))

    np.testing.assert_allclose(np.asarray(jax.grad(loss)(w)),
                               np.asarray(jax.grad(loss_ref)(w)), atol=2e-4)
