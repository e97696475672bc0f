import jax.numpy as jnp
import pytest

from vit_tpu.config import VARIANTS, ViTConfig


def test_b16_defaults_match_reference_model():
    # The reference's hardcoded ViT-B/16 constants (reference vit/vit.py:250-262).
    cfg = ViTConfig()
    assert cfg.num_patches == 196
    assert cfg.seq_len == 197
    assert cfg.head_dim == 64
    assert cfg.patch_dim == 768
    assert cfg.layernorm_eps == 1e-12


@pytest.mark.parametrize("name,seq", [
    ("B/16", 197), ("B/32", 50), ("L/16", 197), ("L/16-384", 577), ("H/14", 257),
    ("DeiT-B/16", 198),
])
def test_variant_seq_lens(name, seq):
    assert VARIANTS[name].seq_len == seq


def test_variants_are_hashable_static_args():
    for cfg in VARIANTS.values():
        hash(cfg)


def test_validation():
    with pytest.raises(ValueError):
        ViTConfig(image_size=225)
    with pytest.raises(ValueError):
        ViTConfig(hidden_dim=100, num_heads=12)
    with pytest.raises(ValueError):
        ViTConfig(pooling="max")
    with pytest.raises(ValueError):
        ViTConfig(num_prefix_tokens=0)


def test_replace():
    cfg = ViTConfig().replace(dtype=jnp.bfloat16)
    assert cfg.dtype == jnp.bfloat16 and cfg.hidden_dim == 768
