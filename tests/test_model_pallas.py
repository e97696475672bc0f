"""Model forward on the full Pallas kernel path (interpret mode on CPU).

The reference's model<->kernel integration testing is its notebook 02 HF
comparison with all kernels live; here the equivalent is: full forward with
``impl='pallas'`` must match ``impl='xla'`` and HF, in both attention modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.config import ViTConfig
from vit_tpu.models import vit

# Larger than test_model.SMALL so kernels see multi-block grids, still fast.
CFG = ViTConfig(image_size=64, patch_size=16, hidden_dim=128, num_heads=4,
                num_layers=2, mlp_dim=256)


@pytest.fixture(scope="module")
def setup():
    params = vit.init_params(jax.random.key(0), CFG)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((2, 3, 64, 64)).astype(np.float32))
    return params, px


@pytest.mark.parametrize("attention", ["flash", "unfused"])
def test_pallas_matches_xla(setup, attention):
    params, px = setup
    want = vit.forward(params, px, CFG, impl="xla", attention=attention)
    got = vit.forward(params, px, CFG, impl="pallas", attention=attention)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_pallas_hf_parity():
    import torch
    import transformers

    from vit_tpu.weights import config_from_hf, params_from_hf

    hf_cfg = transformers.ViTConfig(
        hidden_size=128, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, image_size=64, patch_size=16,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = config_from_hf(hf_cfg)
    params = params_from_hf(hf, cfg)
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(px)).last_hidden_state.numpy()
    got = np.asarray(vit.forward(params, jnp.asarray(px), cfg, impl="pallas"))
    diff = np.abs(got - want).max()
    assert diff < 1e-4, f"max-abs-diff {diff}"


def test_pallas_b16_geometry_jit(setup):
    # Full B/16 shape compile path (jit over pallas kernels) on one layer.
    cfg = ViTConfig(num_layers=1)
    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((1, 3, 224, 224)).astype(np.float32))
    fwd = jax.jit(lambda p, x: vit.forward(p, x, cfg, impl="pallas"))
    want = vit.forward(params, px, cfg, impl="xla")
    np.testing.assert_allclose(np.asarray(fwd(params, px)),
                               np.asarray(want), atol=1e-4)
