"""Custom VJPs of the Pallas kernel tier vs jax.grad of the jnp oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.ops import reference as R
from vit_tpu.ops.pallas import vjp as V
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


@pytest.mark.parametrize("activation", [None, "gelu"])
@pytest.mark.parametrize("with_ln,with_res", [(True, True), (True, False),
                                              (False, True)])
def test_fused_linear_grads_match_oracle(rng, activation, with_ln, with_res):
    m, k, n = 24, 32, 32
    x = jnp.asarray(rng.standard_normal((2, m, k)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.5, jnp.float32)
    b = jnp.asarray(rng.standard_normal(n) * 0.5, jnp.float32)
    gam = jnp.asarray(1 + 0.1 * rng.standard_normal(k), jnp.float32) \
        if with_ln else None
    bet = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32) \
        if with_ln else None
    res = jnp.asarray(rng.standard_normal((2, m, n)) * 0.5, jnp.float32) \
        if with_res else None
    eps = 1e-6

    def loss_pallas(x, w, b, gam, bet, res):
        y = V.fused_linear(x, w, b, gam, bet, res, activation, eps, True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, w, b, gam, bet, res):
        h = R.layernorm(x, gam, bet, eps=eps) if gam is not None else x
        y = R.matmul(h, w, b, activation)
        if res is not None:
            y = y + res
        return jnp.sum(jnp.sin(y))

    args = (x, w, b, gam, bet, res)
    nums = tuple(i for i, a in enumerate(args) if a is not None)
    gp = jax.grad(loss_pallas, argnums=nums)(*args)
    gr = jax.grad(loss_ref, argnums=nums)(*args)
    for got, want in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)


def test_layernorm_grads_match_oracle(rng):
    x = jnp.asarray(rng.standard_normal((2, 24, 32)), jnp.float32)
    gam = jnp.asarray(1 + 0.1 * rng.standard_normal(32), jnp.float32)
    bet = jnp.asarray(0.1 * rng.standard_normal(32), jnp.float32)

    gp = jax.grad(lambda *a: jnp.sum(jnp.sin(V.layernorm(*a, 1e-6, True))),
                  argnums=(0, 1, 2))(x, gam, bet)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(R.layernorm(*a, eps=1e-6))),
                  argnums=(0, 1, 2))(x, gam, bet)
    for got, want in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)


def test_matmul3_softmax_add_grads_match_oracle(rng):
    x = jnp.asarray(rng.standard_normal((3, 16, 24)) * 0.4, jnp.float32)
    y = jnp.asarray(rng.standard_normal((3, 24, 16)) * 0.4, jnp.float32)
    r = jnp.asarray(rng.standard_normal((3, 16, 16)) * 0.4, jnp.float32)

    def chain_pallas(x, y, r):
        s = V.matmul3(x, y, 0.25, True)
        p = V.softmax(s, True)
        return jnp.sum(jnp.sin(V.add(p, r, True)))

    def chain_ref(x, y, r):
        return jnp.sum(jnp.sin(R.softmax(R.matmul3(x, y, scale=0.25)) + r))

    gp = jax.grad(chain_pallas, argnums=(0, 1, 2))(x, y, r)
    gr = jax.grad(chain_ref, argnums=(0, 1, 2))(x, y, r)
    for got, want in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)


def test_patch_embed_grads_match_oracle(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3 * 16 * 16, 48)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(48) * 0.05, jnp.float32)

    gp = jax.grad(lambda *a: jnp.sum(jnp.sin(V.patch_embed(*a, 16, True))),
                  argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(R.patch_embed(*a, 16))),
                  argnums=(0, 1, 2))(x, w, b)
    for got, want in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)


@pytest.mark.parametrize("s,pad_to", [(64, 64), (50, 64)])
def test_flash_attention_grads_match_oracle(rng, s, pad_to):
    shape = (1, 4, s, 64)
    q, k, v = (jnp.asarray(rng.standard_normal(shape) * 0.5, jnp.float32)
               for _ in range(3))
    pad = ((0, 0), (0, 0), (0, pad_to - s), (0, 0))

    def loss_pallas(q, k, v):
        qp, kp, vp = (jnp.pad(a, pad) for a in (q, k, v))
        out = V.attention(qp, kp, vp, None, s, True)
        return jnp.sum(jnp.sin(out[:, :, :s]))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(R.attention(q, k, v)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4)


def test_flash_attention_grads_long_seq_fallback(rng):
    # sp > 768 routes the backward through the jnp chain.
    shape = (1, 1, 800, 64)
    q, k, v = (jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)
               for _ in range(3))

    def loss_pallas(q, k, v):
        return jnp.sum(jnp.sin(V.attention(q, k, v, None, None, True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(R.attention(q, k, v)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4)


def test_model_forward_pallas_grads_match_xla(rng):
    """jax.grad through the FULL model on the pallas tier vs the xla tier."""
    from vit_tpu.config import ViTConfig
    from vit_tpu.models.vit import forward, init_params

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_dim=64, num_heads=4,
                    num_layers=2, mlp_dim=128, num_classes=8)
    params = init_params(jax.random.key(0), cfg)
    px = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)

    def loss(params, impl):
        logits = forward(params, px, cfg, impl=impl)
        return jnp.mean(jax.nn.log_softmax(logits)[:, 0])

    gp = jax.grad(lambda p: loss(p, "pallas"))(params)
    gx = jax.grad(lambda p: loss(p, "xla"))(params)
    flat_p, _ = jax.tree_util.tree_flatten(gp)
    flat_x, _ = jax.tree_util.tree_flatten(gx)
    for got, want in zip(flat_p, flat_x):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)


def test_train_step_pallas_impl(rng):
    """make_train_step(impl='pallas') takes a finite step on the kernel tier."""
    from vit_tpu.config import ViTConfig
    from vit_tpu.models.vit import init_params
    from vit_tpu.train import make_train_step

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_dim=64, num_heads=4,
                    num_layers=2, mlp_dim=128, num_classes=8)
    params = init_params(jax.random.key(1), cfg)
    px = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray([1, 3], jnp.int32)

    init_fn, step_fn = make_train_step(cfg, impl="pallas")
    opt_state = init_fn(params)
    before = jax.tree_util.tree_map(jnp.copy, params)  # step donates params
    params2, _, loss = step_fn(params, opt_state, px, labels)
    assert np.isfinite(float(loss))
    # parameters actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), before, params2)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


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
