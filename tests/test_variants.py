"""All five BASELINE.json model variants run end to end (CPU).

Exercises the odd geometries: B/32's 3072-wide patch vectors, L/16-384's
577 tokens (multi-KV-block flash attention), H/14's 588-wide (unaligned)
patch vectors + head_dim 80 + pooled output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.config import VARIANTS
from vit_tpu.models import vit


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_variant_forward_xla(name, rng):
    cfg = VARIANTS[name].replace(num_layers=2)  # depth-trimmed: geometry test
    params = vit.init_params(jax.random.key(0), cfg)
    px = jnp.asarray(rng.standard_normal(
        (1, 3, cfg.image_size, cfg.image_size)), jnp.float32)
    out = vit.forward(params, px, cfg, impl="xla")
    want = (1, cfg.hidden_dim) if cfg.pooling == "cls" \
        else (1, cfg.seq_len, cfg.hidden_dim)
    assert out.shape == want
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", ["B/32", "L/16-384", "H/14"])
def test_variant_pallas_matches_xla(name, rng):
    cfg = VARIANTS[name].replace(num_layers=1)
    params = vit.init_params(jax.random.key(0), cfg)
    px = jnp.asarray(rng.standard_normal(
        (1, 3, cfg.image_size, cfg.image_size)), jnp.float32)
    a = np.asarray(vit.forward(params, px, cfg, impl="pallas"))
    b = np.asarray(vit.forward(params, px, cfg, impl="xla"))
    np.testing.assert_allclose(a, b, atol=2e-4)
