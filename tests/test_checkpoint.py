"""Checkpoint save/load + safetensors import (SURVEY.md §5 aux subsystem)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import transformers

from vit_tpu.config import ViTConfig
from vit_tpu.models import vit
from vit_tpu.weights import checkpoint as ckpt
from vit_tpu.weights import config_from_hf

SMALL = ViTConfig(image_size=32, patch_size=16, hidden_dim=48, num_heads=4,
                  num_layers=2, mlp_dim=96)


def _tree_equal(a, b):
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(a)[0],
            jax.tree_util.tree_flatten_with_path(b)[0]):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_save_load_roundtrip(tmp_path):
    params = vit.init_params(jax.random.key(0), SMALL)
    path = str(tmp_path / "ckpt" / "b16")
    ckpt.save_params(path, params, SMALL)
    loaded, cfg = ckpt.load_params(path)
    assert cfg == SMALL
    _tree_equal(params, loaded)


def test_load_or_convert_caches(tmp_path):
    calls = []

    def convert():
        calls.append(1)
        return vit.init_params(jax.random.key(0), SMALL), SMALL

    path = str(tmp_path / "cache")
    p1, _ = ckpt.load_or_convert(path, convert)
    p2, _ = ckpt.load_or_convert(path, convert)
    assert len(calls) == 1  # second load hits the cache
    _tree_equal(p1, p2)


def test_params_from_safetensors_matches_torch_path(tmp_path):
    from safetensors.torch import save_file as save_torch

    hf_cfg = transformers.ViTConfig(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96, image_size=32, patch_size=16)
    torch.manual_seed(0)
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=False)
    st = str(tmp_path / "model.safetensors")
    save_torch({k: v.contiguous() for k, v in hf.state_dict().items()}, st)

    cfg = config_from_hf(hf_cfg)
    from vit_tpu.weights import params_from_hf
    want = params_from_hf(hf, cfg)
    got = ckpt.params_from_safetensors(st, cfg)
    _tree_equal(want, got)


def test_loaded_params_run(tmp_path, rng):
    params = vit.init_params(jax.random.key(0), SMALL)
    path = str(tmp_path / "run")
    ckpt.save_params(path, params, SMALL)
    loaded, cfg = ckpt.load_params(path)
    px = np.asarray(rng.standard_normal((1, 3, 32, 32)), np.float32)
    import jax.numpy as jnp
    a = vit.forward(params, jnp.asarray(px), cfg)
    b = vit.forward(loaded, jnp.asarray(px), cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_orbax_roundtrip(tmp_path):
    from vit_tpu.parallel import make_mesh, param_shardings

    mesh = make_mesh(data=4, model=2)
    params = vit.init_params(jax.random.key(0), SMALL)
    shardings = param_shardings(params, mesh, SMALL)
    sharded = jax.device_put(params, shardings)

    path = str(tmp_path / "sharded")
    ckpt.save_sharded(path, sharded, SMALL)

    # restore unsharded
    loaded, cfg = ckpt.load_sharded(path)
    assert cfg == SMALL
    _tree_equal(params, loaded)

    # restore straight into shardings
    loaded2, _ = ckpt.load_sharded(path, shardings)
    _tree_equal(params, loaded2)
    leaf = loaded2["encoder"]["qkv"]["kernel"]
    assert not leaf.sharding.is_fully_replicated


def test_train_state_resume_is_deterministic(tmp_path):
    # Save at step 5, restore into fresh objects, continue 5 more steps —
    # bit-identical to an uninterrupted 10-step run on the same data.
    from vit_tpu.train import make_optimizer, make_train_step

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_dim=48, num_heads=4,
                    num_layers=2, mlp_dim=96, num_classes=4)
    rng = np.random.default_rng(0)
    pixels = [np.asarray(rng.standard_normal((4, 3, 32, 32)), np.float32)
              for _ in range(10)]
    labels = [np.asarray(rng.integers(0, 4, (4,)), np.int32)
              for _ in range(10)]

    def run(start_params, start_opt, lo, hi, losses):
        init_fn, step_fn = make_train_step(cfg, make_optimizer(1e-3))
        params, opt_state = start_params, start_opt
        if opt_state is None:
            opt_state = init_fn(params)
        for i in range(lo, hi):
            params, opt_state, loss = step_fn(params, opt_state,
                                              pixels[i], labels[i])
            losses.append(float(loss))
        return params, opt_state

    base = vit.init_params(jax.random.key(0), cfg)

    fresh = lambda: jax.tree.map(jnp.copy, base)  # step_fn donates its inputs

    ref_losses: list[float] = []
    ref_params, _ = run(fresh(), None, 0, 10, ref_losses)

    losses: list[float] = []
    params, opt_state = run(fresh(), None, 0, 5, losses)
    ckpt.save_train_state(str(tmp_path / "state"), params, opt_state, 5)

    like_params = vit.init_params(jax.random.key(1), cfg)
    init_fn, _ = make_train_step(cfg, make_optimizer(1e-3))
    like = (like_params, init_fn(like_params))
    params, opt_state, step = ckpt.restore_train_state(
        str(tmp_path / "state"), like)
    assert step == 5
    params, _ = run(params, opt_state, 5, 10, losses)

    np.testing.assert_allclose(losses, ref_losses, rtol=0, atol=0)
    _tree_equal(params, ref_params)
