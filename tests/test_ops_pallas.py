"""Pallas kernels vs the jnp oracle, in interpreter mode on CPU.

The per-kernel allclose testing the reference does in each kernel's
``__main__`` (SURVEY.md §4), as a real pytest suite with aligned AND
unaligned (197-token-style) shapes and both dtypes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.ops import reference as R
from vit_tpu.ops.pallas import add as p_add
from vit_tpu.ops.pallas import attention as p_attn
from vit_tpu.ops.pallas import layernorm as p_ln
from vit_tpu.ops.pallas import matmul as p_mm
from vit_tpu.ops.pallas import matmul3 as p_mm3
from vit_tpu.ops.pallas import patch_embed as p_pe
from vit_tpu.ops.pallas import patching as p_patch
from vit_tpu.ops.pallas import softmax as p_sm

F32, BF16 = jnp.float32, jnp.bfloat16


def _tol(dt, f32_tol, bf16_tol):
    return f32_tol if dt == F32 else bf16_tol


def _rand(rng, shape, dt, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape) * scale, dt)


@pytest.mark.parametrize("dt", [F32, BF16])
@pytest.mark.parametrize("shape", [(2, 197, 768), (3, 64, 100), (8, 128)])
def test_add(rng, dt, shape):
    x, y = _rand(rng, shape, dt), _rand(rng, shape, dt)
    got = p_add.add(x, y, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(R.add(x, y), np.float32),
                               atol=_tol(dt, 1e-6, 1e-1))


@pytest.mark.parametrize("dt", [F32, BF16])
@pytest.mark.parametrize("shape", [(2, 197, 768), (4, 50, 100)])
def test_layernorm(rng, dt, shape):
    x = _rand(rng, shape, dt)
    s = _rand(rng, shape[-1:], F32)
    b = _rand(rng, shape[-1:], F32)
    got = p_ln.layernorm(x, s, b, eps=1e-12, interpret=True)
    want = R.layernorm(x, s, b, eps=1e-12)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=_tol(dt, 1e-5, 5e-2))


@pytest.mark.parametrize("dt", [F32, BF16])
@pytest.mark.parametrize("shape", [(2, 197, 197), (24, 197, 64), (4, 16, 300)])
def test_softmax(rng, dt, shape):
    x = _rand(rng, shape, dt, scale=10.0)
    got = p_sm.softmax(x, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(R.softmax(x), np.float32),
                               atol=_tol(dt, 1e-6, 1e-2))


@pytest.mark.parametrize("dt", [F32, BF16])
@pytest.mark.parametrize("m,k,n", [(197, 768, 3072), (100, 588, 64),
                                   (256, 256, 256)])
@pytest.mark.parametrize("bias,act", [(False, None), (True, None),
                                      (True, "gelu")])
def test_matmul(rng, dt, m, k, n, bias, act):
    x = _rand(rng, (2, m, k), dt, scale=0.1)
    w = _rand(rng, (k, n), dt, scale=0.1)
    b = _rand(rng, (n,), dt, scale=0.1) if bias else None
    got = p_mm.matmul(x, w, b, act, interpret=True)
    want = R.matmul(x, w, b, act)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=_tol(dt, 1e-4, 5e-2))


@pytest.mark.parametrize("dt", [F32, BF16])
@pytest.mark.parametrize("b,m,k,n", [(24, 197, 64, 197), (24, 197, 197, 64),
                                     (2, 128, 128, 128)])
@pytest.mark.parametrize("scale", [None, 0.125])
def test_matmul3(rng, dt, b, m, k, n, scale):
    x = _rand(rng, (b, m, k), dt, scale=0.3)
    y = _rand(rng, (b, k, n), dt, scale=0.3)
    got = p_mm3.matmul3(x, y, scale=scale, interpret=True)
    want = R.matmul3(x, y, scale=scale)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=_tol(dt, 1e-4, 5e-2))


@pytest.mark.parametrize("dt", [F32, BF16])
@pytest.mark.parametrize("s", [197, 256, 577, 64])
def test_flash_attention(rng, dt, s):
    shape = (2, 4, s, 64)
    q, k, v = (_rand(rng, shape, dt) for _ in range(3))
    got = p_attn.flash_attention(q, k, v, interpret=True)
    want = R.attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=_tol(dt, 2e-5, 2e-2))


@pytest.mark.parametrize("dt", [F32, BF16])
def test_flash_attention_head_dim_80(rng, dt):
    # H/14 head dim (1280/16 = 80) — unaligned lane dim.
    shape = (1, 2, 257, 80)
    q, k, v = (_rand(rng, shape, dt) for _ in range(3))
    got = p_attn.flash_attention(q, k, v, interpret=True)
    want = R.attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=_tol(dt, 2e-5, 2e-2))


@pytest.mark.parametrize("dt", [F32, BF16])
@pytest.mark.parametrize("s,sp", [(197, 208), (50, 64), (577, 592)])
def test_flash_attention_prepadded_seq_len(rng, dt, s, sp):
    # The model pads the whole encoder to a sublane multiple and passes the
    # real token count via seq_len; padded keys must be masked and real rows
    # must match unpadded attention exactly.
    shape = (2, 4, s, 64)
    q, k, v = (_rand(rng, shape, dt) for _ in range(3))
    pad = ((0, 0), (0, 0), (0, sp - s), (0, 0))
    got = p_attn.flash_attention(jnp.pad(q, pad), jnp.pad(k, pad),
                                 jnp.pad(v, pad), seq_len=s, interpret=True)
    want = R.attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got[:, :, :s], np.float32),
                               np.asarray(want, np.float32),
                               atol=_tol(dt, 2e-5, 2e-2))
    assert np.isfinite(np.asarray(got, np.float32)).all()


def test_flash_attention_seq_len_multi_kv_blocks(rng):
    # seq_len masking through the online-softmax (multi K tile) path.
    s, sp = 577, 592
    shape = (1, 2, s, 64)
    q, k, v = (_rand(rng, shape, jnp.float32) for _ in range(3))
    pad = ((0, 0), (0, 0), (0, sp - s), (0, 0))
    got = p_attn.flash_attention(jnp.pad(q, pad), jnp.pad(k, pad),
                                 jnp.pad(v, pad), seq_len=s,
                                 block_q=128, block_k=128,
                                 force_online=True, interpret=True)
    want = R.attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got[:, :, :s]), np.asarray(want),
                               atol=2e-5)


def test_flash_attention_multi_kv_blocks(rng):
    # Force several sequential K/V tiles to exercise the online-softmax
    # recurrence (not just the single-block fast case).
    shape = (1, 2, 577, 64)
    q, k, v = (_rand(rng, shape, jnp.float32) for _ in range(3))
    got = p_attn.flash_attention(q, k, v, block_q=128, block_k=128,
                                 force_online=True, interpret=True)
    want = R.attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("h,p,c", [(224, 16, 3), (32, 16, 3), (28, 14, 4)])
def test_patching(rng, h, p, c):
    x = _rand(rng, (2, c, h, h), jnp.float32)
    got = p_patch.patchify(x, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(R.patchify(x, p)))


@pytest.mark.parametrize("dt", [F32, BF16])
@pytest.mark.parametrize("h,p,d", [(224, 16, 768), (28, 14, 80)])
def test_patch_embed(rng, dt, h, p, d):
    c = 3
    x = _rand(rng, (2, c, h, h), dt)
    w = _rand(rng, (c * p * p, d), dt, scale=0.05)
    b = _rand(rng, (d,), dt, scale=0.05)
    got = p_pe.patch_embed(x, w, b, p, interpret=True)
    want = R.patch_embed(x, w, b, p)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=_tol(dt, 1e-4, 5e-2))


@pytest.mark.parametrize("dt", [F32, BF16])
@pytest.mark.parametrize("n,k,d,sp", [(196, 768, 768, 208),
                                      (49, 3072, 768, 208),
                                      (256, 588, 1280, 272)])
def test_embed_fused(rng, dt, n, k, d, sp):
    # One-pass projection + CLS + pos + pad-to-sp vs the composed chain
    # (reference vit/vit.py:188-200 semantics + the model's sublane pad).
    patches = _rand(rng, (2, n, k), dt)
    w = _rand(rng, (k, d), dt, scale=0.05)
    b = _rand(rng, (d,), dt, scale=0.05)
    cls = _rand(rng, (d,), dt, scale=0.05)
    pos = _rand(rng, (n, d), dt, scale=0.05)
    got = p_pe.embed_fused(patches, w, b, cls, pos, sp, interpret=True)
    z = (patches.reshape(-1, k).astype(jnp.float32)
         @ w.astype(jnp.float32) + b.astype(jnp.float32)
         ).astype(dt).reshape(2, n, d)
    x = jnp.concatenate([jnp.broadcast_to(cls, (2, 1, d)), z + pos], axis=1)
    want = jnp.pad(x, ((0, 0), (0, sp - n - 1), (0, 0)))
    assert got.shape == (2, sp, d)
    # bf16 tolerance vs the fp32-matmul oracle matches test_patch_embed:
    # the kernel contracts in native bf16 exactly like the composed pallas
    # path (bit-identity vs THAT is pinned by the model-level test below).
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=_tol(dt, 1e-4, 5e-2))


def test_model_embed_fused_matches_composed(monkeypatch):
    # The model-level routing: embed(sp=...) on the pallas tier must be
    # bit-identical to the composed embed + pad.
    import jax
    from vit_tpu.config import ViTConfig
    from vit_tpu.models import vit as m

    cfg = ViTConfig(dtype=jnp.bfloat16)
    params = m.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.standard_normal((2, 3, 224, 224)), jnp.bfloat16)
    monkeypatch.setenv("VIT_TPU_INTERPRET", "1")
    fused = m.embed(params, px, cfg, impl="pallas", sp=208)
    assert fused.shape == (2, 208, cfg.hidden_dim)
    monkeypatch.setenv("VIT_TPU_EMBED_FUSED", "0")
    composed = m.embed(params, px, cfg, impl="pallas", sp=208)
    composed = jnp.pad(composed, ((0, 0), (0, 208 - cfg.seq_len), (0, 0))) \
        if composed.shape[1] != 208 else composed
    np.testing.assert_array_equal(np.asarray(fused, np.float32),
                                  np.asarray(composed, np.float32))


def test_debug_print_if_smoke(capfd):
    # print_if must at least trace/execute without error in interpret mode.
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vit_tpu.ops.pallas.debug import print_if

    def kernel(x_ref, o_ref):
        print_if("pid0 block sum = {}", jnp.sum(x_ref[:]), conds="=0")
        o_ref[:] = x_ref[:]

    x = jnp.ones((16, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        interpret=True,
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
