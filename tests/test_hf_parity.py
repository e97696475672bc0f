"""HF parity — the reference's notebook-02 verification, as a real test suite.

The oracle is ``transformers.ViTModel`` built offline from config with random
init (this environment has no network; pretrained checkpoints load through the
identical state-dict path, so the mapping is exercised fully either way —
exactly what reference 02_verifying_layer_outputs.ipynb does with forward
hooks, including its all-ones structural-debug mode in cells 15-18).

Parity bar: per-layer and end-to-end max-abs-diff, fp32, atol 1e-4
(tighter than the <1e-3 BASELINE.json requirement).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import transformers

from vit_tpu.config import ViTConfig
from vit_tpu.models import vit
from vit_tpu.weights import config_from_hf, params_from_hf


def _make_hf(hidden=48, layers=3, heads=4, inter=96, image=32, patch=16, seed=0):
    hf_cfg = transformers.ViTConfig(
        hidden_size=hidden, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=inter, image_size=image, patch_size=patch,
        attn_implementation="eager")
    torch.manual_seed(seed)
    model = transformers.ViTModel(hf_cfg, add_pooling_layer=False)
    model.eval()
    return model


def _run_both(hf_model, batch=2, seed=0, **fwd_kwargs):
    cfg = config_from_hf(hf_model.config)
    params = params_from_hf(hf_model, cfg)
    rng = np.random.default_rng(seed)
    px = rng.standard_normal(
        (batch, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf_model(torch.from_numpy(px), output_hidden_states=True)
    ours, hiddens = vit.forward_with_intermediates(
        params, jnp.asarray(px), cfg, **fwd_kwargs)
    return cfg, hf_out, np.asarray(ours), [np.asarray(h) for h in hiddens]


def test_small_model_end_to_end_parity():
    hf = _make_hf()
    _, hf_out, ours, _ = _run_both(hf)
    diff = np.abs(hf_out.last_hidden_state.numpy() - ours).max()
    assert diff < 1e-4, f"max-abs-diff {diff}"


def test_small_model_per_layer_parity():
    # Mirrors the per-module hook comparison of reference notebook 02 cell 10.
    hf = _make_hf(seed=3)
    cfg, hf_out, _, hiddens = _run_both(hf, seed=1)
    assert len(hf_out.hidden_states) == len(hiddens)
    for i, (theirs, mine) in enumerate(zip(hf_out.hidden_states, hiddens)):
        diff = np.abs(theirs.numpy() - mine).max()
        assert diff < 1e-4, f"layer {i}: max-abs-diff {diff}"


def test_unfused_attention_parity():
    hf = _make_hf(seed=5)
    _, hf_out, ours, _ = _run_both(hf, attention="unfused")
    diff = np.abs(hf_out.last_hidden_state.numpy() - ours).max()
    assert diff < 1e-4, f"max-abs-diff {diff}"


@pytest.mark.slow
def test_vit_b16_full_size_parity():
    # Full ViT-B/16 geometry (197 tokens, 12 layers) — the reference's actual
    # model (reference vit/vit.py:250-270), random-init weights.
    hf = _make_hf(hidden=768, layers=12, heads=12, inter=3072,
                  image=224, patch=16, seed=7)
    cfg, hf_out, ours, hiddens = _run_both(hf, batch=2)
    assert cfg == ViTConfig()
    for i, (theirs, mine) in enumerate(zip(hf_out.hidden_states, hiddens)):
        diff = np.abs(theirs.numpy() - mine).max()
        assert diff < 5e-4, f"layer {i}: max-abs-diff {diff}"
    diff = np.abs(hf_out.last_hidden_state.numpy() - ours).max()
    assert diff < 1e-3, f"end-to-end max-abs-diff {diff}"


def test_classification_head_import():
    hf_cfg = transformers.ViTConfig(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96, image_size=32, patch_size=16, num_labels=7)
    torch.manual_seed(0)
    hf = transformers.ViTForImageClassification(hf_cfg).eval()
    params = params_from_hf(hf)
    cfg = config_from_hf(hf_cfg, num_classes=7)
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(px)).logits.numpy()
    got = np.asarray(vit.forward(params, jnp.asarray(px), cfg))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_all_ones_structural_debug_mode():
    # The reference's cells 15-18 trick: inject constant weights into both
    # models; any structural mismatch produces huge diffs even when random
    # weights would accidentally agree.
    hf = _make_hf(seed=0)
    sd = hf.state_dict()
    for k, v in sd.items():
        sd[k] = torch.full_like(v, 0.01)
    hf.load_state_dict(sd)
    _, hf_out, ours, _ = _run_both(hf)
    diff = np.abs(hf_out.last_hidden_state.numpy() - ours).max()
    # Constant weights amplify fp32 accumulation-order noise; a structural
    # mismatch would be O(1), so the BASELINE-level bar is the right one here.
    assert diff < 1e-3, f"max-abs-diff {diff}"
