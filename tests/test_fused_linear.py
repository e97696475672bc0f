"""Fused LN->matmul->residual kernel vs the unfused op chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu import ops
from vit_tpu.config import ViTConfig
from vit_tpu.models import vit
from vit_tpu.ops.pallas.layernorm import layernorm_stats
from vit_tpu.ops.pallas.matmul import fused_linear

F32, BF16 = jnp.float32, jnp.bfloat16


def _chain(x, w, b, act, ln_s, ln_b, eps, res):
    h = ops.reference.layernorm(x, ln_s, ln_b, eps=eps) if ln_s is not None else x
    out = ops.reference.matmul(h, w, b, act)
    return out + res if res is not None else out


@pytest.mark.parametrize("dt", [F32, BF16])
@pytest.mark.parametrize("m,k,n", [(197, 768, 768), (64, 100, 52)])
@pytest.mark.parametrize("ln,res,act", [
    (True, False, None), (False, True, None), (True, True, "gelu"),
    (False, False, "gelu"),
])
def test_fused_linear_matches_chain(rng, dt, m, k, n, ln, res, act):
    x = jnp.asarray(rng.standard_normal((2, m, k)), dt)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, dt)
    b = jnp.asarray(rng.standard_normal(n) * 0.05, dt)
    ln_s = jnp.asarray(rng.standard_normal(k), dt) if ln else None
    ln_b = jnp.asarray(rng.standard_normal(k), dt) if ln else None
    r = jnp.asarray(rng.standard_normal((2, m, n)), dt) if res else None
    got = fused_linear(x, w, b, act, ln_scale=ln_s, ln_bias=ln_b,
                       eps=1e-12, residual=r, interpret=True)
    want = _chain(x, w, b, act, ln_s, ln_b, 1e-12, r)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-4 if dt == F32 else 1e-1)


def test_layernorm_stats(rng):
    x = jnp.asarray(rng.standard_normal((2, 37, 100)), F32)
    mu, rstd = layernorm_stats(x, eps=1e-12, interpret=True)
    xf = np.asarray(x).reshape(-1, 100)
    np.testing.assert_allclose(np.asarray(mu)[:, 0], xf.mean(-1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rstd)[:, 0],
                               1 / np.sqrt(xf.var(-1) + 1e-12), rtol=1e-4)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_model_fused_equals_unfused(rng, impl):
    cfg = ViTConfig(image_size=64, patch_size=16, hidden_dim=128,
                    num_heads=4, num_layers=2, mlp_dim=256)
    params = vit.init_params(jax.random.key(0), cfg)
    px = jnp.asarray(rng.standard_normal((2, 3, 64, 64)), F32)
    a = vit.forward(params, px, cfg, impl=impl, fused=True)
    b = vit.forward(params, px, cfg, impl=impl, fused=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
