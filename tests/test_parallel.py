"""Mesh/sharding + training-step tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.config import ViTConfig
from vit_tpu.models import vit
from vit_tpu.parallel import batch_sharding, make_mesh, param_shardings
from vit_tpu.train import make_train_step

TINY = ViTConfig(image_size=32, patch_size=16, hidden_dim=64, num_heads=4,
                 num_layers=2, mlp_dim=128, num_classes=8)


def _setup(mesh, batch):
    params = vit.init_params(jax.random.key(0), TINY)
    params = jax.device_put(params, param_shardings(params, mesh, TINY))
    rng = np.random.default_rng(0)
    px = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, 3, 32, 32)), jnp.float32),
        batch_sharding(mesh))
    labels = jax.device_put(jnp.asarray(rng.integers(0, 8, (batch,)), jnp.int32),
                            batch_sharding(mesh))
    return params, px, labels


def test_requires_8_devices():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"


def test_dp_forward_matches_single_device():
    mesh = make_mesh(data=8, model=1)
    params, px, _ = _setup(mesh, batch=8)
    sharded = jax.jit(lambda p, x: vit.forward(p, x, TINY, impl="xla"))(params, px)
    local = vit.forward(jax.device_get(params), jax.device_get(px), TINY,
                        impl="xla")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local), atol=1e-5)


def test_tp_forward_matches_single_device():
    mesh = make_mesh(data=2, model=4)
    params, px, _ = _setup(mesh, batch=4)
    sharded = jax.jit(lambda p, x: vit.forward(p, x, TINY, impl="xla"))(params, px)
    local = vit.forward(jax.device_get(params), jax.device_get(px), TINY,
                        impl="xla")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local), atol=1e-5)


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2), (2, 4)])
def test_train_step_on_mesh(data, model):
    mesh = make_mesh(data=data, model=model)
    params, px, labels = _setup(mesh, batch=2 * data)
    init_fn, step_fn = make_train_step(TINY)
    opt_state = init_fn(params)
    params2, opt_state, loss = step_fn(params, opt_state, px, labels)
    assert np.isfinite(float(loss))
    # One more step to confirm donated buffers / state threading works.
    params2, opt_state, loss2 = step_fn(params2, opt_state, px, labels)
    assert np.isfinite(float(loss2)) and float(loss2) != float(loss)


def test_train_step_pallas_dp_on_mesh():
    """Batch-DP training on the pallas kernel tier (shard_map + pmean):
    grads must equal the single-device pallas step's."""
    mesh = make_mesh(data=8, model=1)
    params, px, labels = _setup(mesh, batch=8)
    init_fn, step_fn = make_train_step(TINY, impl="pallas", mesh=mesh)
    opt_state = init_fn(params)
    params_dp, _, loss_dp = step_fn(
        jax.tree.map(jnp.copy, params), opt_state, px, labels)

    init1, step1 = make_train_step(TINY, impl="pallas")
    opt1 = init1(jax.device_get(params))
    params_1, _, loss_1 = step1(jax.device_get(params), opt1,
                                jax.device_get(px), jax.device_get(labels))
    assert np.isfinite(float(loss_dp))
    np.testing.assert_allclose(float(loss_dp), float(loss_1), atol=1e-5)
    for a, b in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_graft_entry_single_chip():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 197, 768)


def test_graft_entry_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_train_state_checkpoint_on_mesh(tmp_path):
    # Save a SHARDED training state (params on DP2xTP4, opt state inheriting
    # the shardings), restore straight back onto the mesh, resume one step —
    # identical to the uninterrupted run.
    from vit_tpu.weights.checkpoint import (restore_train_state,
                                            save_train_state)

    mesh = make_mesh(data=2, model=4)
    params, px, labels = _setup(mesh, batch=4)
    init_fn, step_fn = make_train_step(TINY)
    opt_state = init_fn(params)

    keep = jax.tree.map(jnp.copy, (params, opt_state))  # step donates
    params, opt_state, _ = step_fn(params, opt_state, px, labels)
    save_train_state(str(tmp_path / "st"), params, opt_state, 1)
    ref_params, ref_opt, ref_loss = step_fn(params, opt_state, px, labels)

    # Fresh target structure with the same shardings.
    like_params = jax.device_put(vit.init_params(jax.random.key(1), TINY),
                                 param_shardings(keep[0], mesh, TINY))
    like = (like_params, init_fn(like_params))
    params2, opt2, step = restore_train_state(str(tmp_path / "st"), like)
    assert step == 1
    leaf = params2["encoder"]["qkv"]["kernel"]
    assert not leaf.sharding.is_fully_replicated  # restored already-placed
    params2, opt2, loss2 = step_fn(params2, opt2, px, labels)
    assert float(loss2) == float(ref_loss)
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_tp_forward_matches_single_device():
    """Int8 TP (VERDICT r2 #7): the quant pytree Megatron-shards over
    'model' (int8 kernels split like float ones, scales follow the output
    dim) and the XLA quant forward matches the single-device result."""
    from vit_tpu.quant import forward_quant, quantize_params

    mesh = make_mesh(data=2, model=4)
    params = vit.init_params(jax.random.key(0), TINY)
    qparams = quantize_params(params)
    qsh = param_shardings(qparams, mesh, TINY)
    # Quantized kernels got the dict-shaped rule.
    assert set(qsh["encoder"]["qkv"]["kernel"]) == {"q", "scale"}
    qparams_sharded = jax.device_put(qparams, qsh)
    rng = np.random.default_rng(0)
    px = jax.device_put(
        jnp.asarray(rng.standard_normal((4, 3, 32, 32)), jnp.float32),
        batch_sharding(mesh))
    sharded = jax.jit(lambda p, x: forward_quant(p, x, TINY, impl="xla"))(
        qparams_sharded, px)
    local = forward_quant(jax.device_get(qparams), jax.device_get(px), TINY,
                          impl="xla")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               atol=1e-4)


def test_tp_pallas_forward_matches_single_device():
    """Float TP on the pallas tier (round-3): Megatron partial-sum blocks +
    one psum per half under shard_map must match the single-device forward.
    TINY's widths don't tile the kernels, so this exercises the composed
    partial fallback — same decomposition, same collectives."""
    from vit_tpu.parallel import make_tp_forward, prepare_tp_params

    mesh = make_mesh(data=2, model=4)
    params = vit.init_params(jax.random.key(0), TINY)
    tp_params = prepare_tp_params(params, TINY, mesh)
    fn = make_tp_forward(TINY, mesh)
    rng = np.random.default_rng(0)
    px = jax.device_put(
        jnp.asarray(rng.standard_normal((4, 3, 32, 32)), jnp.float32),
        batch_sharding(mesh))
    sharded = fn(tp_params, px)
    local = vit.forward(params, jax.device_get(px), TINY, impl="xla")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               atol=1e-5)


def test_tp_pallas_kernel_path_matches():
    """Same, on a geometry whose LOCAL widths tile the mega-kernels
    (d=256, 2 local heads -> dl=128, mlp_l=256): the partial-sum Pallas
    kernels themselves run (interpret mode on CPU), not the fallback."""
    from vit_tpu.ops.pallas import block as blk
    from vit_tpu.parallel import make_tp_forward, prepare_tp_params

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_dim=256, num_heads=4,
                    num_layers=2, mlp_dim=512, num_classes=8)
    mesh = make_mesh(data=4, model=2)
    b_shard, sp = 1, 16
    assert blk.attn_block_partial_plan(b_shard, sp, 256, 128, 4) is not None
    assert blk.mlp_block_plan(b_shard * sp, 256, 256, 4) is not None

    params = vit.init_params(jax.random.key(1), cfg)
    tp_params = prepare_tp_params(params, cfg, mesh)
    fn = make_tp_forward(cfg, mesh)
    rng = np.random.default_rng(1)
    px = jax.device_put(
        jnp.asarray(rng.standard_normal((4, 3, 32, 32)), jnp.float32),
        batch_sharding(mesh))
    sharded = fn(tp_params, px)
    local = vit.forward(params, jax.device_get(px), cfg, impl="xla")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               atol=2e-5)


def test_tp_pallas_predictor_serves_on_mesh():
    from vit_tpu.serving import Predictor

    mesh = make_mesh(data=2, model=4)
    params = vit.init_params(jax.random.key(0), TINY)
    pred = Predictor(params, TINY, buckets=(2, 4), impl="pallas", mesh=mesh)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((5, 3, 32, 32)), jnp.float32)
    out = pred(px)
    assert out.shape == (5, TINY.num_classes)
    local = vit.forward(params, px, TINY, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(local), atol=1e-5)


def test_int8_tp_predictor_serves_on_mesh():
    from vit_tpu.serving import Predictor

    mesh = make_mesh(data=2, model=4)
    params = vit.init_params(jax.random.key(0), TINY)
    pred = Predictor(params, TINY, buckets=(2, 4), impl="xla", mesh=mesh,
                     quant=True)
    rng = np.random.default_rng(0)
    out = pred(jnp.asarray(rng.standard_normal((5, 3, 32, 32)), jnp.float32))
    assert out.shape == (5, TINY.num_classes)
    assert np.all(np.isfinite(np.asarray(out)))


def test_tp_pallas_quant_forward_matches_single_device():
    """Int8 TP on the PALLAS tier (round-4, VERDICT r3 #8): Megatron
    partial-sum int8 blocks + one psum per half under shard_map. TINY's
    widths don't tile the kernels, so this exercises the composed int8
    fallback; tolerance absorbs the per-shard activation-quant difference
    (context rows are max-abs-scaled over dl columns instead of D)."""
    from vit_tpu.parallel import make_tp_forward, prepare_tp_params
    from vit_tpu.quant import forward_quant, quantize_params

    mesh = make_mesh(data=2, model=4)
    params = vit.init_params(jax.random.key(0), TINY)
    qparams = quantize_params(params)
    tp_params = prepare_tp_params(qparams, TINY, mesh)
    fn = make_tp_forward(TINY, mesh, quant=True)
    rng = np.random.default_rng(0)
    px = jax.device_put(
        jnp.asarray(rng.standard_normal((4, 3, 32, 32)), jnp.float32),
        batch_sharding(mesh))
    sharded = fn(tp_params, px)
    local = forward_quant(jax.device_get(qparams), jax.device_get(px), TINY,
                          impl="xla")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               atol=1e-2)


def test_tp_pallas_quant_kernel_path_matches():
    """Same, on a geometry whose LOCAL widths tile the int8 mega-kernels
    (d=256, 2 local heads -> dl=128, mlp_l=256): attn_block_q_partial and
    the partial int8 MLP kernels themselves run (interpret mode on CPU)."""
    from vit_tpu.ops.pallas import block as blk
    from vit_tpu.parallel import make_tp_forward, prepare_tp_params
    from vit_tpu.quant import forward_quant, quantize_params

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_dim=256, num_heads=4,
                    num_layers=2, mlp_dim=512, num_classes=8)
    mesh = make_mesh(data=4, model=2)
    b_shard, sp = 1, 16
    assert blk.attn_block_q_partial_plan(b_shard, sp, 256, 128, 4) is not None
    assert blk.mlp_block_plan_i8(b_shard * sp, 256, 256, 4) is not None

    params = vit.init_params(jax.random.key(1), cfg)
    qparams = quantize_params(params)
    tp_params = prepare_tp_params(qparams, cfg, mesh)
    fn = make_tp_forward(cfg, mesh, quant=True)
    rng = np.random.default_rng(1)
    px = jax.device_put(
        jnp.asarray(rng.standard_normal((4, 3, 32, 32)), jnp.float32),
        batch_sharding(mesh))
    sharded = fn(tp_params, px)
    local = forward_quant(qparams, jax.device_get(px), cfg, impl="xla")
    # 2e-2: per-shard rows are max-abs-quantized over dl / mlp_l columns
    # instead of the full width, so the int8 rounding differs from the
    # single-device reference by design (the error does not grow with
    # model size — B/16-scale checks sit at ~1e-3 relative).
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               atol=2e-2)


def test_int8_tp_pallas_predictor_serves_on_mesh():
    """Predictor(impl='pallas', quant=True, mesh=DPxTP) routes through the
    int8 tp_pallas forward (the round-3 assert is gone) and matches the
    single-device quant output at 1e-2 — VERDICT r3 #8's done-check."""
    from vit_tpu.quant import forward_quant, quantize_params
    from vit_tpu.serving import Predictor

    mesh = make_mesh(data=2, model=4)
    params = vit.init_params(jax.random.key(0), TINY)
    pred = Predictor(params, TINY, buckets=(2, 4), impl="pallas", mesh=mesh,
                     quant=True)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((5, 3, 32, 32)), jnp.float32)
    out = pred(px)
    assert out.shape == (5, TINY.num_classes)
    local = forward_quant(quantize_params(params), px, TINY, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(local), atol=1e-2)
