"""Transformer-block mega-kernel tests (vit_tpu/ops/pallas/block.py).

Parity of the one-kernel-per-sub-block path against the composed op chain
(interpret mode on CPU), plan gating, and gradient correctness of the
custom VJPs (backward recomputes through the composed differentiable ops).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu import ops
from vit_tpu.ops import reference
from vit_tpu.ops.pallas import block


def _mlp_inputs(rng, b=2, s=32, d=256, mlp=512, dtype=jnp.float32):
    arr = lambda *sh, sc=0.1: jnp.asarray(rng.standard_normal(sh) * sc, dtype)
    x = jnp.asarray(rng.standard_normal((b, s, d)), dtype)
    return (x, arr(d, sc=0.5) + 1, arr(d), arr(d, mlp), arr(mlp),
            arr(mlp, d), arr(d))


def _attn_inputs(rng, b=2, s=32, d=256, heads=4, dtype=jnp.float32):
    arr = lambda *sh, sc=0.1: jnp.asarray(rng.standard_normal(sh) * sc, dtype)
    x = jnp.asarray(rng.standard_normal((b, s, d)), dtype)
    return (x, arr(d, sc=0.5) + 1, arr(d), arr(d, 3 * d), arr(3 * d),
            arr(d, d), arr(d))


def test_mlp_block_matches_composed():
    rng = np.random.default_rng(0)
    x, g, be, w1, b1, w2, b2 = _mlp_inputs(rng)
    got = ops.mlp_block(x, g, be, w1, b1, w2, b2, impl="pallas")
    want = ops.mlp_block(x, g, be, w1, b1, w2, b2, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=0)


def test_attn_block_matches_composed_with_padding():
    rng = np.random.default_rng(1)
    seq_len = 27  # padded rows (27 -> 32) must be masked as keys
    x, g, be, wqkv, bqkv, wout, bout = _attn_inputs(rng)
    x = x.at[:, seq_len:].set(0)
    got = ops.attn_block(x, g, be, wqkv, bqkv, wout, bout, num_heads=4,
                         seq_len=seq_len, impl="pallas")
    want = ops.attn_block(x, g, be, wqkv, bqkv, wout, bout, num_heads=4,
                          seq_len=seq_len, impl="xla")
    np.testing.assert_allclose(np.asarray(got[:, :seq_len]),
                               np.asarray(want[:, :seq_len]),
                               atol=2e-4, rtol=0)


def test_attn_block_odd_head_slices():
    """head_dim 64 < lane width: odd heads slice at unaligned lane offsets
    inside the kernel — the case the packed layout must get right."""
    rng = np.random.default_rng(2)
    x, g, be, wqkv, bqkv, wout, bout = _attn_inputs(rng, d=256, heads=4)
    got = ops.attn_block(x, g, be, wqkv, bqkv, wout, bout, num_heads=4,
                         impl="pallas")
    want = ops.attn_block(x, g, be, wqkv, bqkv, wout, bout, num_heads=4,
                          impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=0)


def test_mlp_block_row_blocked_weight_streaming(monkeypatch):
    """Grid (nm, nt) with BOTH axes > 1: row blocks each re-stream the
    weight tiles — the regime for geometries whose resident weights
    exceed VMEM (H/14's 2*d*mlp = 26 MB bf16)."""
    rng = np.random.default_rng(8)
    x, g, be, w1, b1, w2, b2 = _mlp_inputs(rng, b=4, s=32, d=256, mlp=512)
    monkeypatch.setenv("VIT_TPU_MLP_PLAN", "64,2,256")  # nm=2, nt=2
    got = ops.mlp_block(x, g, be, w1, b1, w2, b2, impl="pallas")
    monkeypatch.delenv("VIT_TPU_MLP_PLAN")
    want = ops.mlp_block(x, g, be, w1, b1, w2, b2, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=0)


def test_attn_block_head_dim_80():
    """H/14's geometry: head_dim 80 — slices are neither lane-aligned nor
    a lane divisor. Mirrors hidden 1280 / 16 heads at test scale (640/8)."""
    rng = np.random.default_rng(7)
    seq_len = 27
    x, g, be, wqkv, bqkv, wout, bout = _attn_inputs(rng, d=640, heads=8)
    x = x.at[:, seq_len:].set(0)
    got = ops.attn_block(x, g, be, wqkv, bqkv, wout, bout, num_heads=8,
                         seq_len=seq_len, impl="pallas")
    want = ops.attn_block(x, g, be, wqkv, bqkv, wout, bout, num_heads=8,
                          seq_len=seq_len, impl="xla")
    np.testing.assert_allclose(np.asarray(got[:, :seq_len]),
                               np.asarray(want[:, :seq_len]),
                               atol=5e-4, rtol=0)


def test_plans_gate_infeasible_geometry():
    # Giant weights cannot be VMEM-resident -> no plan -> model falls back.
    assert block.mlp_block_plan(1024, 8192, 32768, 4) is None
    # Unaligned hidden dim -> no plan.
    assert block.mlp_block_plan(1024, 768 + 8, 3072, 2) is None
    assert block.attn_block_plan(8, 208, 768 + 8, 12, 2) is None
    # The flagship geometry always has a plan in both dtypes.
    for itemsize in (2, 4):
        assert block.mlp_block_plan(6656, 768, 3072, itemsize) is not None
        assert block.attn_block_plan(32, 208, 768, 12, itemsize) is not None


def test_model_uses_block_path():
    """The fused pallas model path must route through the mega-kernels for
    the flagship geometry (guards against silent fallback)."""
    from vit_tpu.config import ViTConfig
    cfg = ViTConfig()
    assert ops.block_plans(32, 208, cfg.hidden_dim, cfg.mlp_dim,
                           cfg.num_heads, 2)


def test_mlp_block_grads_match_xla():
    rng = np.random.default_rng(3)
    args = _mlp_inputs(rng, b=1, s=16, d=256, mlp=512)

    def loss(impl):
        def f(*a):
            out = ops.mlp_block(*a, impl=impl)
            return jnp.sum(out * out).astype(jnp.float32)
        return f

    gp = jax.grad(loss("pallas"), argnums=tuple(range(7)))(*args)
    gx = jax.grad(loss("xla"), argnums=tuple(range(7)))(*args)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)


def test_attn_block_grads_match_xla():
    rng = np.random.default_rng(4)
    args = _attn_inputs(rng, b=1, s=32, d=256, heads=4)

    def loss(impl):
        def f(*a):
            out = ops.attn_block(*a, num_heads=4, impl=impl)
            return jnp.sum(out * out).astype(jnp.float32)
        return f

    gp = jax.grad(loss("pallas"), argnums=tuple(range(7)))(*args)
    gx = jax.grad(loss("xla"), argnums=tuple(range(7)))(*args)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)


def _stack_inputs(rng, L=2, d=128, mlp=256, dtype=jnp.float32):
    arr = lambda *sh, sc=0.1: jnp.asarray(rng.standard_normal(sh) * sc, dtype)
    return {
        "ln1": {"scale": arr(L, d, sc=0.2) + 1, "bias": arr(L, d)},
        "qkv": {"kernel": arr(L, d, 3 * d), "bias": arr(L, 3 * d)},
        "out": {"kernel": arr(L, d, d), "bias": arr(L, d)},
        "ln2": {"scale": arr(L, d, sc=0.2) + 1, "bias": arr(L, d)},
        "fc1": {"kernel": arr(L, d, mlp), "bias": arr(L, mlp)},
        "fc2": {"kernel": arr(L, mlp, d), "bias": arr(L, d)},
    }


def test_encoder_stack_matches_composed():
    """Whole-encoder mega-kernel == scan of the composed op chain, with a
    padded tail masked as keys."""
    rng = np.random.default_rng(6)
    b, s, d, heads, seq_len = 1, 16, 128, 2, 13
    enc = _stack_inputs(rng)
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    x = x.at[:, seq_len:].set(0)
    got = ops.encoder_stack(x, enc, num_heads=heads, seq_len=seq_len,
                            impl="pallas")
    want = ops.encoder_stack(x, enc, num_heads=heads, seq_len=seq_len,
                             impl="xla")
    np.testing.assert_allclose(np.asarray(got[:, :seq_len]),
                               np.asarray(want[:, :seq_len]),
                               atol=5e-4, rtol=0)


def test_encoder_stack_flat_grid_identical(monkeypatch):
    """The opt-in flat 1-D grid (plan {"flat": 1}, round-5 cross-layer
    pipelining lever) is bit-identical to the (L, T) grid on both the
    float and int8 stacks — same schedule, same bodies, divmod indices."""
    from vit_tpu.ops.pallas.block import encoder_stack, encoder_stack_q
    from vit_tpu.quant import quantize_weight

    rng = np.random.default_rng(17)
    b, s, d, heads, seq_len = 2, 16, 128, 2, 13
    enc = _stack_inputs(rng)
    mlp = enc["fc1"]["kernel"].shape[2]
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    x = x.at[:, seq_len:].set(0)
    monkeypatch.setenv("VIT_TPU_STACK_PLAN", f"{d},{mlp},0")
    base = encoder_stack(x, enc, num_heads=heads, seq_len=seq_len,
                         interpret=True)
    monkeypatch.setenv("VIT_TPU_STACK_PLAN", f"{d},{mlp},1")
    flat = encoder_stack(x, enc, num_heads=heads, seq_len=seq_len,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(flat))

    qenc = {k: (dict(v, kernel=quantize_weight(v["kernel"]))
                if "kernel" in v else v) for k, v in enc.items()}
    monkeypatch.setenv("VIT_TPU_STACK_PLAN", f"{d},{mlp},0")
    qbase = encoder_stack_q(x, qenc, num_heads=heads, seq_len=seq_len,
                            interpret=True)
    monkeypatch.setenv("VIT_TPU_STACK_PLAN", f"{d},{mlp},1")
    qflat = encoder_stack_q(x, qenc, num_heads=heads, seq_len=seq_len,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(qbase), np.asarray(qflat))


def test_encoder_stack_grads_match_xla():
    rng = np.random.default_rng(7)
    b, s, d, heads = 1, 8, 128, 1
    enc = _stack_inputs(rng, L=1)
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)

    def loss(impl):
        def f(x, enc):
            out = ops.encoder_stack(x, enc, num_heads=heads, impl=impl)
            return jnp.sum(out * out).astype(jnp.float32)
        return f

    gp = jax.grad(loss("pallas"), argnums=(0, 1))(x, enc)
    gx = jax.grad(loss("xla"), argnums=(0, 1))(x, enc)
    for a, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-3, rtol=1e-3)


def test_stack_plan_gates():
    # Flagship small-batch geometries have a plan in bf16.
    assert block.encoder_stack_plan(1, 208, 768, 3072, 12, 2) is not None
    assert block.encoder_stack_plan(2, 208, 768, 3072, 12, 2) is not None
    # Large batch -> no plan (activation residency infeasible) -> the model
    # falls back to the per-layer mega-kernels.
    assert block.encoder_stack_plan(32, 208, 768, 3072, 12, 2) is None
    # Unaligned dims -> no plan.
    assert block.encoder_stack_plan(1, 208, 768 + 8, 3072, 12, 2) is None


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_block_model_forward_matches_unfused(dtype):
    """Full model: fused pallas (block kernels) vs unfused pallas chain."""
    from vit_tpu.config import ViTConfig
    from vit_tpu.models.vit import forward, init_params

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_dim=256,
                    num_heads=4, num_layers=2, mlp_dim=512, dtype=dtype)
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    got = forward(params, px, cfg, impl="pallas", attention="flash")
    want = forward(params, px, cfg, impl="pallas", attention="unfused",
                   fused=False)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=0)


def test_one_sided_mega_routing(monkeypatch):
    """A geometry where only ONE half-block has a feasible plan still fuses
    that half (H/14 fp32: MLP weights fit streamed, attention's don't).
    encoder_block must route each half independently."""
    from vit_tpu.config import ViTConfig
    from vit_tpu.models.vit import encoder_block
    from vit_tpu.ops.pallas import block as pb

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_dim=256,
                    num_heads=4, num_layers=1, mlp_dim=512)
    rng = np.random.default_rng(11)
    arr = lambda *sh, sc=0.1: jnp.asarray(rng.standard_normal(sh) * sc,
                                          jnp.float32)
    d, mlp = 256, 512
    lp = {"ln1": {"scale": arr(d, sc=0.5) + 1, "bias": arr(d)},
          "qkv": {"kernel": arr(d, 3 * d), "bias": arr(3 * d)},
          "out": {"kernel": arr(d, d), "bias": arr(d)},
          "ln2": {"scale": arr(d, sc=0.5) + 1, "bias": arr(d)},
          "fc1": {"kernel": arr(d, mlp), "bias": arr(mlp)},
          "fc2": {"kernel": arr(mlp, d), "bias": arr(d)}}
    x = jnp.asarray(rng.standard_normal((2, 32, d)), jnp.float32)
    want = encoder_block(x, lp, cfg, impl="xla", attention="unfused",
                         fused=False)

    for gate in ("attn_block_plan", "mlp_block_plan"):
        with monkeypatch.context() as mp:
            mp.setattr(pb, gate, lambda *a, **k: None)
            got = encoder_block(x, lp, cfg, impl="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=0)


def _layer_inputs(rng, b=2, s=32, d=256, heads=4, mlp=512,
                  dtype=jnp.float32):
    arr = lambda *sh, sc=0.1: jnp.asarray(rng.standard_normal(sh) * sc, dtype)
    x = jnp.asarray(rng.standard_normal((b, s, d)), dtype)
    return (x, arr(d, sc=0.5) + 1, arr(d), arr(d, 3 * d), arr(3 * d),
            arr(d, d), arr(d), arr(d, sc=0.5) + 1, arr(d),
            arr(d, mlp), arr(mlp), arr(mlp, d), arr(d))


def test_layer_block_matches_composed_with_padding():
    rng = np.random.default_rng(5)
    seq_len = 27
    a = _layer_inputs(rng)
    x = a[0].at[:, seq_len:].set(0)
    got = ops.layer_block(x, *a[1:], num_heads=4, seq_len=seq_len,
                          impl="pallas")
    want = ops.layer_block(x, *a[1:], num_heads=4, seq_len=seq_len,
                           impl="xla")
    np.testing.assert_allclose(np.asarray(got[:, :seq_len]),
                               np.asarray(want[:, :seq_len]),
                               atol=5e-4, rtol=0)


def test_layer_block_chunked_hidden():
    """nc > 1: the MLP hidden is produced in column chunks."""
    rng = np.random.default_rng(6)
    a = _layer_inputs(rng)
    got = block.layer_block(*a, num_heads=4, plan={"group": 2, "ct": 256},
                            interpret=True)
    want = ops.layer_block(*a, num_heads=4, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=0)


def test_layer_block_plan_is_opt_in(monkeypatch, tmp_path):
    from vit_tpu.ops.pallas import tuning
    monkeypatch.setattr(tuning, "_PATH", str(tmp_path / "tuned.json"))
    tuning._load_cached.cache_clear()
    # No tuned entry, no env -> None (the model keeps the two-kernel path).
    assert block.layer_block_plan(32, 208, 768, 3072, 12, 2) is None
    # Env force -> a feasible plan.
    monkeypatch.setenv("VIT_TPU_LAYER_PLAN", "1,512")
    plan = block.layer_block_plan(32, 208, 768, 3072, 12, 2)
    assert plan == {"group": 1, "ct": 512}
    # Infeasible geometry stays gated even when forced.
    assert block.layer_block_plan(8, 208, 8192, 32768, 16, 4) is None
    tuning._load_cached.cache_clear()


def test_layer_block_grad_matches_composed():
    rng = np.random.default_rng(7)
    a = _layer_inputs(rng)

    def loss_mega(*args):
        return jnp.mean(ops.layer_block(*args, num_heads=4,
                                        impl="pallas") ** 2)

    def loss_chain(*args):
        return jnp.mean(ops.layer_block(*args, num_heads=4, impl="xla") ** 2)

    g_mega = jax.grad(loss_mega, argnums=(0, 3, 9))(*a)
    g_chain = jax.grad(loss_chain, argnums=(0, 3, 9))(*a)
    for gm, gc in zip(g_mega, g_chain):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gc),
                                   atol=5e-3, rtol=1e-3)


def test_model_routes_layer_block_when_forced(monkeypatch):
    """With a forced layer plan, the model's fused pallas path runs the
    full-layer mega-kernel and still matches the xla forward."""
    from vit_tpu.config import ViTConfig
    from vit_tpu.models import vit

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_dim=128,
                    num_heads=4, num_layers=2, mlp_dim=256)
    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(8)
    px = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    want = np.asarray(vit.forward(params, px, cfg, impl="xla"))
    monkeypatch.setenv("VIT_TPU_LAYER_PLAN", "1,256")
    got = np.asarray(vit.forward(params, px, cfg, impl="pallas"))
    np.testing.assert_allclose(got, want, atol=5e-4)


def _stacked_inputs(rng, l=3, b=2, s=32, d=256, mlp=512, heads=4,
                    dtype=jnp.float32):
    arr = lambda *sh, sc=0.1: jnp.asarray(rng.standard_normal(sh) * sc, dtype)
    x = jnp.asarray(rng.standard_normal((b, s, d)), dtype)
    enc = {
        "ln1": {"scale": arr(l, d, sc=0.5) + 1, "bias": arr(l, d)},
        "qkv": {"kernel": arr(l, d, 3 * d), "bias": arr(l, 3 * d)},
        "out": {"kernel": arr(l, d, d), "bias": arr(l, d)},
        "ln2": {"scale": arr(l, d, sc=0.5) + 1, "bias": arr(l, d)},
        "fc1": {"kernel": arr(l, d, mlp), "bias": arr(l, mlp)},
        "fc2": {"kernel": arr(l, mlp, d), "bias": arr(l, d)},
    }
    return x, enc


def _scan_stacked(x, enc, heads=4):
    def body(h, i):
        h = ops.attn_block_stacked(
            h, enc["ln1"]["scale"], enc["ln1"]["bias"],
            enc["qkv"]["kernel"], enc["qkv"]["bias"],
            enc["out"]["kernel"], enc["out"]["bias"], i, num_heads=heads)
        h = ops.mlp_block_stacked(
            h, enc["ln2"]["scale"], enc["ln2"]["bias"],
            enc["fc1"]["kernel"], enc["fc1"]["bias"],
            enc["fc2"]["kernel"], enc["fc2"]["bias"], i)
        return h, None
    return jax.lax.scan(body, x, jnp.arange(
        enc["qkv"]["kernel"].shape[0]))[0]


def test_stacked_blocks_match_sliced_scan():
    """The scalar-prefetch stacked kernels under lax.scan(index) must equal
    the per-layer kernels under lax.scan(sliced params)."""
    rng = np.random.default_rng(7)
    x, enc = _stacked_inputs(rng)

    def body(h, lp):
        h = ops.attn_block(h, lp["ln1"]["scale"], lp["ln1"]["bias"],
                           lp["qkv"]["kernel"], lp["qkv"]["bias"],
                           lp["out"]["kernel"], lp["out"]["bias"],
                           num_heads=4, impl="pallas")
        return ops.mlp_block(h, lp["ln2"]["scale"], lp["ln2"]["bias"],
                             lp["fc1"]["kernel"], lp["fc1"]["bias"],
                             lp["fc2"]["kernel"], lp["fc2"]["bias"],
                             impl="pallas"), None

    want = jax.lax.scan(body, x, enc)[0]
    got = jax.jit(_scan_stacked)(x, enc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=0)


def test_stacked_blocks_grads_match_xla():
    """jax.grad through the stacked scan (custom VJPs: slice + remat +
    scatter) must match the XLA composed chain's grads."""
    rng = np.random.default_rng(8)
    x, enc = _stacked_inputs(rng, l=2)

    def loss_stacked(enc, x):
        return jnp.mean(_scan_stacked(x, enc) ** 2)

    def loss_xla(enc, x):
        def body(h, lp):
            h = ops.attn_block(h, lp["ln1"]["scale"], lp["ln1"]["bias"],
                               lp["qkv"]["kernel"], lp["qkv"]["bias"],
                               lp["out"]["kernel"], lp["out"]["bias"],
                               num_heads=4, impl="xla")
            return ops.mlp_block(h, lp["ln2"]["scale"], lp["ln2"]["bias"],
                                 lp["fc1"]["kernel"], lp["fc1"]["bias"],
                                 lp["fc2"]["kernel"], lp["fc2"]["bias"],
                                 impl="xla"), None
        return jnp.mean(jax.lax.scan(body, x, enc)[0] ** 2)

    got = jax.grad(loss_stacked)(enc, x)
    want = jax.grad(loss_xla)(enc, x)
    for ga, wa in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(wa),
                                   atol=5e-5, rtol=0)


def test_model_routes_stacked_scan():
    """A plannable geometry off the encoder_stack gate must take the
    stacked-scan path in forward() and match the XLA tier."""
    from vit_tpu.config import ViTConfig
    from vit_tpu.models.vit import forward, init_params

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_dim=256,
                    num_heads=4, num_layers=3, mlp_dim=512)
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(9)
    px = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    got = forward(params, px, cfg, impl="pallas")
    want = forward(params, px, cfg, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=0)


def _fused_stack_case(rng, b=1, n_tok=12, pd=48, sp=16, d=128, heads=2,
                      L=2, mlp=256, dtype=jnp.float32):
    arr = lambda *sh, sc=0.1: jnp.asarray(rng.standard_normal(sh) * sc, dtype)
    enc = _stack_inputs(rng, L=L, d=d, mlp=mlp, dtype=dtype)
    patches = jnp.asarray(rng.standard_normal((b, n_tok, pd)), dtype)
    wemb = arr(pd, d, sc=0.3)
    base = jnp.concatenate(
        [arr(1 + n_tok, d, sc=0.5), jnp.zeros((sp - 1 - n_tok, d), dtype)])
    lnf = {"scale": arr(d, sc=0.2) + 1, "bias": arr(d)}
    return patches, enc, wemb, base, lnf


def _fused_stack_composed(patches, enc, wemb, base, lnf, *, heads, sp,
                          seq_len):
    """Independent jnp oracle: embed assembly -> XLA stack -> final LN."""
    b, n, _ = patches.shape
    d = wemb.shape[1]
    z = jnp.einsum("bnk,kd->bnd", patches, wemb,
                   preferred_element_type=jnp.float32)
    x = jnp.broadcast_to(base.astype(jnp.float32), (b, sp, d))
    x = x.at[:, 1:1 + n].add(z).astype(patches.dtype)
    x = ops.encoder_stack(x, enc, num_heads=heads, seq_len=seq_len,
                          impl="xla")
    return reference.layernorm(x, lnf["scale"], lnf["bias"])


def test_encoder_stack_fused_matches_composed():
    """Embed-folded whole-encoder kernel (patch proj + encoder + final LN
    in ONE pallas_call) == the composed embed -> XLA stack -> LN chain."""
    rng = np.random.default_rng(12)
    args = _fused_stack_case(rng)
    sp, seq_len, heads = 16, 13, 2
    got = ops.encoder_stack_fused(*args, num_heads=heads, sp=sp,
                                  seq_len=seq_len)
    want = _fused_stack_composed(*args, heads=heads, sp=sp, seq_len=seq_len)
    np.testing.assert_allclose(np.asarray(got[:, :seq_len]),
                               np.asarray(want[:, :seq_len]),
                               atol=5e-4, rtol=0)


def test_encoder_stack_fused_grads_match_xla():
    rng = np.random.default_rng(13)
    args = _fused_stack_case(rng, L=1)
    sp, seq_len, heads = 16, 13, 2

    def loss(fused):
        def f(patches, enc, wemb, base, lnf):
            out = (ops.encoder_stack_fused(patches, enc, wemb, base, lnf,
                                           num_heads=heads, sp=sp,
                                           seq_len=seq_len)
                   if fused else
                   _fused_stack_composed(patches, enc, wemb, base, lnf,
                                         heads=heads, sp=sp,
                                         seq_len=seq_len))
            return jnp.sum(out[:, :seq_len] ** 2).astype(jnp.float32)
        return f

    gp = jax.grad(loss(True), argnums=(0, 1, 2, 3, 4))(*args)
    gx = jax.grad(loss(False), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-3, rtol=1e-3)


def test_model_routes_fold_embed(monkeypatch):
    """forward() with the embed fold on == off (the fold gate:
    models/vit.py VIT_TPU_FOLD_EMBED + ops.stack_fused_plan)."""
    from vit_tpu.config import ViTConfig
    from vit_tpu.models.vit import forward, init_params

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_dim=256,
                    num_heads=4, num_layers=2, mlp_dim=512)
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(14)
    px = jnp.asarray(rng.standard_normal((1, 3, 32, 32)), jnp.float32)
    it = jnp.dtype(cfg.dtype).itemsize
    from vit_tpu.models.vit import _padded_seq
    sp = _padded_seq(cfg, "pallas", "flash")
    assert ops.stack_fused_plan(1, cfg.num_patches, cfg.patch_dim, sp,
                                cfg.hidden_dim, cfg.mlp_dim,
                                cfg.num_heads, it)
    monkeypatch.setenv("VIT_TPU_FOLD_EMBED", "1")
    got = forward(params, px, cfg, impl="pallas")
    monkeypatch.setenv("VIT_TPU_FOLD_EMBED", "0")
    want = forward(params, px, cfg, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=0)
