"""Training step (capability extension; the reference is inference-only).

The reference's roadmap explicitly scopes training out (reference
README.md:31-33) — this module exists so the framework can also fine-tune the
classifier variants end-to-end on a device mesh, and to exercise the full
DP+TP sharded compile path. It is deliberately thin: loss + optax update,
jitted once; sharding comes entirely from the inputs' ``NamedSharding``s
(GSPMD propagation), so the same step function runs single-chip or on any
('data', 'model') mesh.

Training uses ``impl='xla'`` — the jnp op path is differentiable as-is;
the Pallas kernels are inference-path accelerators (custom VJPs are a
possible future extension, not required for reference parity).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from vit_tpu.config import ViTConfig
from vit_tpu.models.vit import Params, forward


def cross_entropy_loss(params: Params, pixels: jax.Array, labels: jax.Array,
                       cfg: ViTConfig) -> jax.Array:
    """Mean softmax cross-entropy over a batch of integer labels."""
    assert cfg.num_classes > 0, "training requires a classification head"
    logits = forward(params, pixels, cfg, impl="xla")
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def make_optimizer(learning_rate: float = 1e-4,
                   weight_decay: float = 0.05) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, weight_decay=weight_decay)


def make_train_step(cfg: ViTConfig,
                    optimizer: optax.GradientTransformation | None = None):
    """Returns ``(init_fn, step_fn)``, both jitted.

    ``init_fn(params) -> opt_state`` (inherits params' shardings);
    ``step_fn(params, opt_state, pixels, labels) -> (params, opt_state, loss)``.
    """
    optimizer = optimizer or make_optimizer()

    @jax.jit
    def init_fn(params: Params):
        return optimizer.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params: Params, opt_state: Any, pixels: jax.Array,
                labels: jax.Array):
        loss, grads = jax.value_and_grad(cross_entropy_loss)(
            params, pixels, labels, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_fn, step_fn
