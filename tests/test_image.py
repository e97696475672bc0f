"""Preprocessing parity vs transformers.ViTImageProcessor."""

import numpy as np
import pytest

from vit_tpu.utils.image import preprocess


@pytest.fixture(scope="module")
def hf_proc():
    from transformers import ViTImageProcessor
    return ViTImageProcessor()  # google/vit defaults


def test_matches_hf_processor_same_size(hf_proc, rng):
    imgs = rng.integers(0, 256, (2, 224, 224, 3), dtype=np.uint8)
    want = hf_proc(list(imgs), return_tensors="np")["pixel_values"]
    got = np.asarray(preprocess(imgs))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matches_hf_processor_resize(hf_proc, rng):
    imgs = rng.integers(0, 256, (2, 300, 400, 3), dtype=np.uint8)
    want = hf_proc(list(imgs), return_tensors="np")["pixel_values"]
    got = np.asarray(preprocess(imgs))
    assert got.shape == want.shape == (2, 3, 224, 224)
    # Bilinear resampling differs slightly between PIL and jax.image;
    # bound the deviation tightly rather than exactly.
    diff = np.abs(got - want)
    assert np.quantile(diff, 0.99) < 0.06, np.quantile(diff, 0.99)
    assert diff.mean() < 0.02


def test_accepts_nchw_float(rng):
    imgs = rng.integers(0, 256, (2, 3, 224, 224)).astype(np.float32)
    out = np.asarray(preprocess(imgs))
    assert out.shape == (2, 3, 224, 224)
    # normalize((x/255)) with mean=std=0.5 -> range [-1, 1]
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_jit_and_bf16():
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda x: preprocess(x, size=224, dtype=jnp.bfloat16))
    out = fn(jnp.zeros((1, 64, 64, 3), jnp.uint8))
    assert out.dtype == jnp.bfloat16 and out.shape == (1, 3, 224, 224)
