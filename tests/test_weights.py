"""Weight-import verification (reference vit/utils.py:45-113 semantics)."""

import numpy as np
import pytest
import torch
import transformers

from vit_tpu.weights import config_from_hf, params_from_hf, params_from_state_dict
from vit_tpu.weights.hf import verify_params


def _hf(**kw):
    cfg = transformers.ViTConfig(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96, image_size=32, patch_size=16, **kw)
    torch.manual_seed(0)
    return transformers.ViTModel(cfg, add_pooling_layer=True)


def test_pooler_knowingly_skipped():
    # The reference's mapping listed pooler keys but silently dropped them
    # (reference vit/utils.py:63-64); here the skip is explicit and the
    # import still covers everything else.
    hf = _hf()
    assert any(k.startswith("pooler.") for k in hf.state_dict())
    params = params_from_hf(hf)
    assert "classifier" not in params


def test_qkv_fused_layout():
    hf = _hf()
    cfg = config_from_hf(hf.config)
    params = params_from_hf(hf, cfg)
    d = cfg.hidden_dim
    qkv = np.asarray(params["encoder"]["qkv"]["kernel"])
    assert qkv.shape == (cfg.num_layers, d, 3 * d)
    # Column block 0 is Q for layer 0: equals HF query weight transposed.
    qw = hf.state_dict()["encoder.layer.0.attention.attention.query.weight"].numpy()
    np.testing.assert_allclose(qkv[0, :, :d], qw.T, atol=0)
    vw = hf.state_dict()["encoder.layer.0.attention.attention.value.weight"].numpy()
    np.testing.assert_allclose(qkv[0, :, 2 * d:], vw.T, atol=0)


def test_missing_tensor_raises():
    hf = _hf()
    sd = dict(hf.state_dict())
    del sd["encoder.layer.1.intermediate.dense.weight"]
    with pytest.raises(KeyError, match="intermediate"):
        params_from_state_dict(sd, config_from_hf(hf.config))


def test_unconsumed_tensor_raises():
    hf = _hf()
    sd = dict(hf.state_dict())
    sd["encoder.layer.0.mystery.weight"] = torch.ones(3)
    with pytest.raises(KeyError, match="unconsumed"):
        params_from_state_dict(sd, config_from_hf(hf.config))


def test_zero_weight_scan():
    # Reference's all-zero scan (reference vit/utils.py:104-111).
    hf = _hf()
    sd = dict(hf.state_dict())
    sd["encoder.layer.0.output.dense.weight"] = torch.zeros_like(
        sd["encoder.layer.0.output.dense.weight"])
    with pytest.raises(ValueError, match="all zeros"):
        params_from_state_dict(sd, config_from_hf(hf.config))
    params = params_from_hf(_hf())
    verify_params(params)  # clean import passes


def test_vit_prefix_stripped():
    cfg = transformers.ViTConfig(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96, image_size=32, patch_size=16, num_labels=5)
    torch.manual_seed(0)
    hf = transformers.ViTForImageClassification(cfg)
    params = params_from_hf(hf)
    assert params["classifier"]["kernel"].shape == (48, 5)
