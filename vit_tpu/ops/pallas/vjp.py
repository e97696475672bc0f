"""Differentiable wrappers for the Pallas kernels (custom VJPs).

The reference is inference-only, so its kernels have no backward story
(reference README.md:31-33 scopes training out). Here EVERY op the model's
pallas path uses is differentiable, so ``jax.grad`` through
``forward(..., impl='pallas')`` works end-to-end and the train step can run
on the kernel tier (vit_tpu/train.py ``make_train_step(impl=...)``).

Design: the backward *matmuls* — where the FLOPs are — run on the same
Pallas kernels as the forward; cheap elementwise/reduction glue (softmax
backward, LN stats backward) stays in jnp, which XLA fuses well. Fused-GELU
epilogues are handled by rematerializing the pre-activation (one extra
forward matmul — the standard remat trade: no (M, N) pre-activation buffer
is ever saved). The flash-attention backward is its own grouped Pallas
kernel with recomputed probabilities (the FlashAttention backward scheme:
nothing S x S ever hits HBM).

dx = (g * act'(pre)) @ W^T      dW = x^T @ (g * act'(pre))
db = sum_rows(g * act'(pre))    act'(z) = dGELU/dz (erf form)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.activations import erf
from vit_tpu.ops.pallas.common import round_up
from vit_tpu.ops.pallas.matmul import _dot_precision, matmul
from vit_tpu.ops.pallas.matmul import fused_linear as _fused_linear_fwd_kernel

_INV_SQRT_2PI = 0.3989422804014327


def gelu_grad(z: jax.Array) -> jax.Array:
    """d/dz [0.5 z (1 + erf(z/sqrt(2)))] = Phi(z) + z phi(z)."""
    phi = _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)
    cdf = 0.5 * (1.0 + erf(z * (2.0 ** -0.5)))
    return cdf + z * phi


# ----------------------------------------------------------------- linear --

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def linear(x: jax.Array, w: jax.Array, b: jax.Array | None,
           activation: str | None = None, interpret: bool = False):
    """Differentiable fused linear: ``act(x @ w + b)`` on the Pallas kernel."""
    return matmul(x, w, b, activation, interpret=interpret)


def _linear_fwd(x, w, b, activation, interpret):
    y = matmul(x, w, b, activation, interpret=interpret)
    return y, (x, w, b)


def _linear_bwd(activation, interpret, res, g):
    x, w, b = res
    k, n = w.shape
    xf = x.reshape(-1, k)
    gf = g.reshape(-1, n)
    if activation == "gelu":
        # Rematerialize the pre-activation with the same fused kernel.
        pre = matmul(x, w, b, None, interpret=interpret).reshape(-1, n)
        gf = (gf.astype(jnp.float32)
              * gelu_grad(pre.astype(jnp.float32))).astype(g.dtype)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    dx = matmul(gf, w.T, interpret=interpret).reshape(x.shape)
    dw = matmul(xf.T, gf, interpret=interpret)
    db = None if b is None else jnp.sum(gf, axis=0).astype(b.dtype)
    return dx, dw, db


linear.defvjp(_linear_fwd, _linear_bwd)


# ----------------------------------------------------------- fused_linear --

def _ln_stats32(xf, eps):
    x32 = xf.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (x32 - mu) * rstd  # xhat


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_linear(x, w, b, ln_scale, ln_bias, residual,
                 activation: str | None = None, eps: float = 1e-12,
                 interpret: bool = False):
    """Differentiable ``act(LN(x) @ w + b) + residual`` (one Pallas pass).

    Array args may be None (no bias / no LN / no residual); their grads
    come back None.
    """
    return _fused_linear_fwd_kernel(
        x, w, b, activation, ln_scale=ln_scale, ln_bias=ln_bias, eps=eps,
        residual=residual, interpret=interpret)


def _fused_linear_fwd(x, w, b, ln_scale, ln_bias, residual, activation, eps,
                      interpret):
    y = _fused_linear_fwd_kernel(
        x, w, b, activation, ln_scale=ln_scale, ln_bias=ln_bias, eps=eps,
        residual=residual, interpret=interpret)
    return y, (x, w, b, ln_scale, ln_bias, residual is not None)


def _fused_linear_bwd(activation, eps, interpret, res, g):
    x, w, b, ln_scale, ln_bias, has_res = res
    k, n = w.shape
    xf = x.reshape(-1, k)
    gf = g.reshape(-1, n)

    if ln_scale is not None:
        xhat = _ln_stats32(xf, eps)
        h = (xhat * ln_scale.astype(jnp.float32)
             + ln_bias.astype(jnp.float32)).astype(x.dtype)
    else:
        xhat = None
        h = xf

    if activation == "gelu":
        # Remat pre-activation on the Pallas kernel (no LN re-fuse needed:
        # h is already normalized here).
        pre = matmul(h, w, b, None, interpret=interpret)
        gf = (gf.astype(jnp.float32)
              * gelu_grad(pre.astype(jnp.float32))).astype(g.dtype)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")

    db = None if b is None else jnp.sum(gf, axis=0).astype(b.dtype)
    dw = matmul(h.T, gf, interpret=interpret)
    dh = matmul(gf, w.T, interpret=interpret)

    if ln_scale is not None:
        dh32 = dh.astype(jnp.float32)
        dgamma = jnp.sum(dh32 * xhat, axis=0).astype(ln_scale.dtype)
        dbeta = jnp.sum(dh32, axis=0).astype(ln_bias.dtype)
        dxhat = dh32 * ln_scale.astype(jnp.float32)
        # Standard LN input grad: rstd * (dxhat - mean(dxhat) - xhat*mean(dxhat*xhat))
        x32 = xf.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        dx = rstd * (dxhat
                     - jnp.mean(dxhat, axis=-1, keepdims=True)
                     - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
        dx = dx.astype(x.dtype).reshape(x.shape)
    else:
        dgamma = dbeta = None
        dx = dh.astype(x.dtype).reshape(x.shape)

    dres = g if has_res else None
    return dx, dw, db, dgamma, dbeta, dres


fused_linear.defvjp(_fused_linear_fwd, _fused_linear_bwd)


# -------------------------------------------------------------- layernorm --

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layernorm(x, scale, bias, eps: float = 1e-12, interpret: bool = False):
    """Differentiable row layernorm on the Pallas kernel."""
    from vit_tpu.ops.pallas.layernorm import layernorm as _k
    return _k(x, scale, bias, eps=eps, interpret=interpret)


def _layernorm_fwd(x, scale, bias, eps, interpret):
    from vit_tpu.ops.pallas.layernorm import layernorm as _k
    return _k(x, scale, bias, eps=eps, interpret=interpret), (x, scale)


def _layernorm_bwd(eps, interpret, res, g):
    x, scale = res
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    gf = g.reshape(-1, d).astype(jnp.float32)
    xhat = _ln_stats32(xf, eps)
    dgamma = jnp.sum(gf * xhat, axis=0).astype(scale.dtype)
    dbeta = jnp.sum(gf, axis=0).astype(scale.dtype)
    dxhat = gf * scale.astype(jnp.float32)
    x32 = xf.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    dx = rstd * (dxhat
                 - jnp.mean(dxhat, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dx.astype(x.dtype).reshape(x.shape), dgamma, dbeta


layernorm.defvjp(_layernorm_fwd, _layernorm_bwd)


# ---------------------------------------------------------------- matmul3 --

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def matmul3(x, y, scale: float | None = None, interpret: bool = False):
    """Differentiable batched matmul (B,M,K)@(B,K,N) with fused scaling."""
    from vit_tpu.ops.pallas.matmul3 import matmul3 as _k
    return _k(x, y, scale=scale, interpret=interpret)


def _matmul3_fwd(x, y, scale, interpret):
    from vit_tpu.ops.pallas.matmul3 import matmul3 as _k
    return _k(x, y, scale=scale, interpret=interpret), (x, y)


def _matmul3_bwd(scale, interpret, res, g):
    from vit_tpu.ops.pallas.matmul3 import matmul3 as _k
    x, y = res
    dx = _k(g, y.transpose(0, 2, 1), scale=scale, interpret=interpret)
    dy = _k(x.transpose(0, 2, 1), g, scale=scale, interpret=interpret)
    return dx, dy


matmul3.defvjp(_matmul3_fwd, _matmul3_bwd)


# ---------------------------------------------------------------- softmax --

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def softmax(x, interpret: bool = False):
    """Differentiable row softmax on the Pallas kernel."""
    from vit_tpu.ops.pallas.softmax import softmax as _k
    return _k(x, interpret=interpret)


def _softmax_fwd(x, interpret):
    from vit_tpu.ops.pallas.softmax import softmax as _k
    p = _k(x, interpret=interpret)
    return p, (p,)


def _softmax_bwd(interpret, res, g):
    (p,) = res
    g32, p32 = g.astype(jnp.float32), p.astype(jnp.float32)
    dx = p32 * (g32 - jnp.sum(g32 * p32, axis=-1, keepdims=True))
    return (dx.astype(p.dtype),)


softmax.defvjp(_softmax_fwd, _softmax_bwd)


# -------------------------------------------------------------------- add --

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def add(x, y, interpret: bool = False):
    """Differentiable elementwise add on the Pallas kernel."""
    from vit_tpu.ops.pallas.add import add as _k
    return _k(x, y, interpret=interpret)


def _add_fwd(x, y, interpret):
    from vit_tpu.ops.pallas.add import add as _k
    return _k(x, y, interpret=interpret), ()


def _add_bwd(interpret, res, g):
    return g, g


add.defvjp(_add_fwd, _add_bwd)


# ------------------------------------------------------------ patch_embed --

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def patch_embed(x, w, b, patch_size: int, interpret: bool = False):
    """Differentiable unfold+matmul patch embedding on the Pallas kernels."""
    from vit_tpu.ops.pallas.patch_embed import patch_embed as _k
    return _k(x, w, b, patch_size, interpret=interpret)


def _patch_embed_fwd(x, w, b, patch_size, interpret):
    from vit_tpu.ops.pallas.patch_embed import patch_embed as _k
    return _k(x, w, b, patch_size, interpret=interpret), (x, w, b)


def _patch_embed_bwd(patch_size, interpret, res, g):
    from vit_tpu.ops import reference
    x, w, b = res
    bsz, _, _ = g.shape
    n = w.shape[1]
    gf = g.reshape(-1, n)
    # dW on the Pallas matmul; the unfold transpose (fold) stays jnp — it is
    # a pure data-movement op XLA lowers to one copy.
    patches = reference.patchify(x, patch_size).reshape(gf.shape[0], -1)
    dw = matmul(patches.T, gf, interpret=interpret)
    db = None if b is None else jnp.sum(gf, axis=0).astype(b.dtype)
    dpatches = matmul(gf, w.T, interpret=interpret)
    _, fold = jax.vjp(lambda img: reference.patchify(img, patch_size), x)
    (dx,) = fold(dpatches.reshape(bsz, -1, w.shape[0]).astype(x.dtype))
    return dx, dw, db


patch_embed.defvjp(_patch_embed_fwd, _patch_embed_bwd)


# -------------------------------------------------------- flash attention --

def _flash_bwd_group_kernel(q_ref, k_ref, v_ref, g_ref,
                            dq_ref, dk_ref, dv_ref, *, scale: float,
                            seq_len: int, sp: int, group: int, precision):
    """Grouped single-tile FlashAttention backward: recompute probs per head
    in VMEM (never materialized to HBM), then
    dv = p^T g; dp = g v^T; ds = p*(dp - rowsum(dp*p)); dq = ds k * scale;
    dk = ds^T q * scale."""
    neg_inf = float("-inf")
    for i in range(group):
        sl = slice(i * sp, (i + 1) * sp)
        q, k, v, g = q_ref[sl, :], k_ref[sl, :], v_ref[sl, :], g_ref[sl, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision) * scale
        if seq_len != sp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < seq_len, s, neg_inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)          # (sp, sp) fp32
        pcast = p.astype(v.dtype)
        # dv = p^T @ g : contract row axes of p and g
        dv = jax.lax.dot_general(pcast, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
        # dp = g @ v^T
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dscast = ds.astype(q.dtype)
        dq = jax.lax.dot_general(dscast, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=precision) * scale
        # dk = ds^T @ q : contract row axes
        dk = jax.lax.dot_general(dscast, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=precision) * scale
        dq_ref[sl, :] = dq.astype(dq_ref.dtype)
        dk_ref[sl, :] = dk.astype(dk_ref.dtype)
        dv_ref[sl, :] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def attention(q, k, v, scale: float | None = None,
              seq_len: int | None = None, interpret: bool = False):
    """Differentiable flash attention on the Pallas kernels."""
    from vit_tpu.ops.pallas.attention import flash_attention
    return flash_attention(q, k, v, scale=scale, seq_len=seq_len,
                           interpret=interpret)


def _attention_fwd(q, k, v, scale, seq_len, interpret):
    from vit_tpu.ops.pallas.attention import flash_attention
    out = flash_attention(q, k, v, scale=scale, seq_len=seq_len,
                          interpret=interpret)
    return out, (q, k, v)


def _attention_bwd(scale, seq_len, interpret, res, g):
    from vit_tpu.ops import reference
    from vit_tpu.ops.pallas.attention import _pick_group

    q, k, v = res
    b, h, s, d = q.shape
    if scale is None:
        scale = d ** -0.5
    real_len = s if seq_len is None else seq_len
    sp = round_up(s, 16)

    if sp > 768:
        # Long-sequence regime: fall back to the jnp chain for the backward
        # (training at >768 tokens is outside every BASELINE variant; the
        # forward stays on the online-softmax kernel).
        _, vjp_fn = jax.vjp(
            lambda q_, k_, v_: reference.attention(q_, k_, v_, scale=scale,
                                                   seq_len=seq_len), q, k, v)
        return vjp_fn(g)

    bh = b * h

    def rows(x):
        x = x.reshape(bh, s, d)
        if sp != s:
            x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
        return x.reshape(bh * sp, d)

    qf, kf, vf, gf = rows(q), rows(k), rows(v), rows(g)
    # Backward holds ~2x the forward's live tiles per head: halve the group.
    group = max(1, _pick_group(bh, sp, d, q.dtype) // 2)
    while bh % group:
        group -= 1
    kernel = functools.partial(
        _flash_bwd_group_kernel, scale=scale, seq_len=real_len, sp=sp,
        group=group, precision=_dot_precision(q.dtype))
    spec = pl.BlockSpec((group * sp, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((bh * sp, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh // group,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * s * s * d,
            bytes_accessed=7 * b * h * s * d * q.dtype.itemsize,
            transcendentals=b * h * s * s),
        interpret=interpret,
    )(qf, kf, vf, gf)

    def unrows(x):
        x = x.reshape(bh, sp, d)
        if sp != s:
            x = x[:, :s]
        return x.reshape(b, h, s, d)

    return unrows(dq), unrows(dk), unrows(dv)


attention.defvjp(_attention_fwd, _attention_bwd)


# ----------------------------------------------------------- block kernels --

def _mlp_composed(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret):
    """The op-chain equivalent of the mlp_block mega-kernel, built from the
    differentiable fused_linear ops — the backward recomputes through this
    (standard remat: nothing block-sized is saved from the forward)."""
    h = fused_linear(x, w1, b1, ln_scale, ln_bias, None, "gelu", eps,
                     interpret)
    return fused_linear(h, w2, b2, None, None, x, None, eps, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float = 1e-12,
              interpret: bool = False):
    """Differentiable ``x + fc2(gelu(fc1(LN(x))))`` mega-kernel
    (vit_tpu/ops/pallas/block.py)."""
    from vit_tpu.ops.pallas.block import mlp_block as _k
    return _k(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps,
              interpret=interpret)


def _mlp_block_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret):
    from vit_tpu.ops.pallas.block import mlp_block as _k
    y = _k(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps, interpret=interpret)
    return y, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _mlp_block_bwd(eps, interpret, res, g):
    _, vjp_fn = jax.vjp(
        lambda *a: _mlp_composed(*a, eps, interpret), *res)
    return vjp_fn(g)


mlp_block.defvjp(_mlp_block_fwd, _mlp_block_bwd)


def _attn_composed(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
                   num_heads, scale, seq_len, eps, interpret):
    """Differentiable op-chain equivalent of attn_block (remat backward)."""
    b, sp, d = x.shape
    hd = d // num_heads
    qkv = fused_linear(x, wqkv, bqkv, ln_scale, ln_bias, None, None, eps,
                       interpret)
    q, k, v = qkv.reshape(b, sp, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    ctx = attention(q, k, v, scale, seq_len, interpret)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, sp, d)
    return fused_linear(ctx, wout, bout, None, None, x, None, eps, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def attn_block(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
               num_heads: int, scale: float | None = None,
               seq_len: int | None = None, eps: float = 1e-12,
               interpret: bool = False):
    """Differentiable ``x + proj(MHA(LN(x)))`` mega-kernel
    (vit_tpu/ops/pallas/block.py)."""
    from vit_tpu.ops.pallas.block import attn_block as _k
    return _k(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
              num_heads=num_heads, scale=scale, seq_len=seq_len, eps=eps,
              interpret=interpret)


def _attn_block_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
                    num_heads, scale, seq_len, eps, interpret):
    from vit_tpu.ops.pallas.block import attn_block as _k
    y = _k(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
           num_heads=num_heads, scale=scale, seq_len=seq_len, eps=eps,
           interpret=interpret)
    return y, (x, ln_scale, ln_bias, wqkv, bqkv, wout, bout)


def _attn_block_bwd(num_heads, scale, seq_len, eps, interpret, res, g):
    _, vjp_fn = jax.vjp(
        lambda *a: _attn_composed(*a, num_heads, scale, seq_len, eps,
                                  interpret), *res)
    return vjp_fn(g)


attn_block.defvjp(_attn_block_fwd, _attn_block_bwd)


# --- scan-stacked indexed forms (vit_tpu/ops/pallas/block.py *_stacked) ---
#
# Forward: the scalar-prefetch kernels read layer ``idx``'s weights straight
# from the stacked (L, ...) arrays (no per-layer HBM slice copies under
# lax.scan). Backward: slice layer idx (a copy is fine here — training pays
# it willingly), remat through the composed differentiable chain, and
# scatter the per-layer weight grads back into (L, ...) cotangents; the
# scan's closed-over-value accumulation sums them across layers.

def _at_layer(a, idx):
    return jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False)


def _scatter_layer(full, idx, grad):
    return jnp.zeros_like(full).at[idx].set(grad.astype(full.dtype))


def _int_zero(idx):
    import numpy as np
    return np.zeros(jnp.shape(idx), jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def mlp_block_stacked(x, ln_scale, ln_bias, w1, b1, w2, b2, idx,
                      eps: float = 1e-12, interpret: bool = False):
    """Differentiable scan-stacked MLP mega-kernel (layer ``idx`` of the
    stacked params, weights read in-kernel — no slice copies)."""
    from vit_tpu.ops.pallas.block import mlp_block_stacked as _k
    return _k(x, ln_scale, ln_bias, w1, b1, w2, b2, idx, eps=eps,
              interpret=interpret)


def _mlp_block_stacked_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, idx, eps,
                           interpret):
    from vit_tpu.ops.pallas.block import mlp_block_stacked as _k
    y = _k(x, ln_scale, ln_bias, w1, b1, w2, b2, idx, eps=eps,
           interpret=interpret)
    return y, (x, ln_scale, ln_bias, w1, b1, w2, b2, idx)


def _mlp_block_stacked_bwd(eps, interpret, res, g):
    x, gsc, gbn, w1, b1, w2, b2, idx = res
    sliced = tuple(_at_layer(a, idx) for a in (gsc, gbn, w1, b1, w2, b2))
    _, vjp_fn = jax.vjp(
        lambda *a: _mlp_composed(*a, eps, interpret), x, *sliced)
    dx, dg, dbn, dw1, db1, dw2, db2 = vjp_fn(g)
    return (dx, _scatter_layer(gsc, idx, dg), _scatter_layer(gbn, idx, dbn),
            _scatter_layer(w1, idx, dw1), _scatter_layer(b1, idx, db1),
            _scatter_layer(w2, idx, dw2), _scatter_layer(b2, idx, db2),
            _int_zero(idx))


mlp_block_stacked.defvjp(_mlp_block_stacked_fwd, _mlp_block_stacked_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def attn_block_stacked(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, idx,
                       num_heads: int, scale: float | None = None,
                       seq_len: int | None = None, eps: float = 1e-12,
                       interpret: bool = False):
    """Differentiable scan-stacked attention mega-kernel (layer ``idx``)."""
    from vit_tpu.ops.pallas.block import attn_block_stacked as _k
    return _k(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, idx,
              num_heads=num_heads, scale=scale, seq_len=seq_len, eps=eps,
              interpret=interpret)


def _attn_block_stacked_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
                            idx, num_heads, scale, seq_len, eps, interpret):
    from vit_tpu.ops.pallas.block import attn_block_stacked as _k
    y = _k(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, idx,
           num_heads=num_heads, scale=scale, seq_len=seq_len, eps=eps,
           interpret=interpret)
    return y, (x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, idx)


def _attn_block_stacked_bwd(num_heads, scale, seq_len, eps, interpret,
                            res, g):
    x, gsc, gbn, wqkv, bqkv, wout, bout, idx = res
    sliced = tuple(_at_layer(a, idx)
                   for a in (gsc, gbn, wqkv, bqkv, wout, bout))
    _, vjp_fn = jax.vjp(
        lambda *a: _attn_composed(*a, num_heads, scale, seq_len, eps,
                                  interpret), x, *sliced)
    dx, dg, dbn, dwqkv, dbqkv, dwout, dbout = vjp_fn(g)
    return (dx, _scatter_layer(gsc, idx, dg), _scatter_layer(gbn, idx, dbn),
            _scatter_layer(wqkv, idx, dwqkv),
            _scatter_layer(bqkv, idx, dbqkv),
            _scatter_layer(wout, idx, dwout),
            _scatter_layer(bout, idx, dbout), _int_zero(idx))


attn_block_stacked.defvjp(_attn_block_stacked_fwd, _attn_block_stacked_bwd)


def _layer_composed(x, g1, bn1, wqkv, bqkv, wout, bout, g2, bn2, w1, b1,
                    w2, b2, num_heads, scale, seq_len, eps, interpret):
    """Differentiable op-chain equivalent of layer_block (remat backward)."""
    y = _attn_composed(x, g1, bn1, wqkv, bqkv, wout, bout,
                       num_heads, scale, seq_len, eps, interpret)
    return _mlp_composed(y, g2, bn2, w1, b1, w2, b2, eps, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def layer_block(x, g1, bn1, wqkv, bqkv, wout, bout, g2, bn2, w1, b1, w2, b2,
                num_heads: int, scale: float | None = None,
                seq_len: int | None = None, eps: float = 1e-12,
                interpret: bool = False):
    """Differentiable full-encoder-layer mega-kernel
    (vit_tpu/ops/pallas/block.py:layer_block)."""
    from vit_tpu.ops.pallas.block import layer_block as _k
    return _k(x, g1, bn1, wqkv, bqkv, wout, bout, g2, bn2, w1, b1, w2, b2,
              num_heads=num_heads, scale=scale, seq_len=seq_len, eps=eps,
              interpret=interpret)


def _layer_block_fwd(x, g1, bn1, wqkv, bqkv, wout, bout, g2, bn2, w1, b1,
                     w2, b2, num_heads, scale, seq_len, eps, interpret):
    from vit_tpu.ops.pallas.block import layer_block as _k
    y = _k(x, g1, bn1, wqkv, bqkv, wout, bout, g2, bn2, w1, b1, w2, b2,
           num_heads=num_heads, scale=scale, seq_len=seq_len, eps=eps,
           interpret=interpret)
    return y, (x, g1, bn1, wqkv, bqkv, wout, bout, g2, bn2, w1, b1, w2, b2)


def _layer_block_bwd(num_heads, scale, seq_len, eps, interpret, res, g):
    _, vjp_fn = jax.vjp(
        lambda *a: _layer_composed(*a, num_heads, scale, seq_len, eps,
                                   interpret), *res)
    return vjp_fn(g)


layer_block.defvjp(_layer_block_fwd, _layer_block_bwd)


def _stack_composed(x, enc, num_heads, scale, seq_len, eps, interpret):
    """Differentiable op-chain equivalent of the encoder-stack mega-kernel:
    lax.scan of the composed per-layer blocks (remat backward)."""
    def body(h, lp):
        h = _attn_composed(h, lp["ln1"]["scale"], lp["ln1"]["bias"],
                           lp["qkv"]["kernel"], lp["qkv"]["bias"],
                           lp["out"]["kernel"], lp["out"]["bias"],
                           num_heads, scale, seq_len, eps, interpret)
        return _mlp_composed(h, lp["ln2"]["scale"], lp["ln2"]["bias"],
                             lp["fc1"]["kernel"], lp["fc1"]["bias"],
                             lp["fc2"]["kernel"], lp["fc2"]["bias"],
                             eps, interpret), None
    return jax.lax.scan(body, x, enc)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def encoder_stack(x, enc, num_heads: int, scale: float | None = None,
                  seq_len: int | None = None, eps: float = 1e-12,
                  interpret: bool = False):
    """Differentiable whole-encoder mega-kernel
    (vit_tpu/ops/pallas/block.py:encoder_stack)."""
    from vit_tpu.ops.pallas.block import encoder_stack as _k
    return _k(x, enc, num_heads=num_heads, scale=scale, seq_len=seq_len,
              eps=eps, interpret=interpret)


def _encoder_stack_fwd(x, enc, num_heads, scale, seq_len, eps, interpret):
    from vit_tpu.ops.pallas.block import encoder_stack as _k
    y = _k(x, enc, num_heads=num_heads, scale=scale, seq_len=seq_len,
           eps=eps, interpret=interpret)
    return y, (x, enc)


def _encoder_stack_bwd(num_heads, scale, seq_len, eps, interpret, res, g):
    x, enc = res
    _, vjp_fn = jax.vjp(
        lambda x, enc: _stack_composed(x, enc, num_heads, scale, seq_len,
                                       eps, interpret), x, enc)
    return vjp_fn(g)


encoder_stack.defvjp(_encoder_stack_fwd, _encoder_stack_bwd)


def _stack_fused_composed(patches, enc, wemb, base, lnf, num_heads, sp,
                          scale, seq_len, eps, interpret):
    """Differentiable op-chain equivalent of the embed-folded stack:
    jnp embed assembly -> composed per-layer scan -> final layernorm."""
    b, n, pd = patches.shape
    d = wemb.shape[1]
    z = jnp.einsum("bnk,kd->bnd", patches, wemb,
                   preferred_element_type=jnp.float32)
    x = jnp.broadcast_to(base.astype(jnp.float32), (b, sp, d))
    x = x.at[:, 1:1 + n].add(z).astype(patches.dtype)
    x = _stack_composed(x, enc, num_heads, scale, seq_len, eps, interpret)
    from vit_tpu.ops import reference
    return reference.layernorm(x, lnf["scale"], lnf["bias"], eps=eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def encoder_stack_fused(patches, enc, wemb, base, lnf, num_heads: int,
                        sp: int, scale: float | None = None,
                        seq_len: int | None = None, eps: float = 1e-12,
                        interpret: bool = False):
    """Differentiable embed-folded whole-encoder mega-kernel
    (vit_tpu/ops/pallas/block.py:encoder_stack_fused)."""
    from vit_tpu.ops.pallas.block import encoder_stack_fused as _k
    return _k(patches, enc, wemb, base, lnf, num_heads=num_heads, sp=sp,
              scale=scale, seq_len=seq_len, eps=eps, interpret=interpret)


def _encoder_stack_fused_fwd(patches, enc, wemb, base, lnf, num_heads, sp,
                             scale, seq_len, eps, interpret):
    from vit_tpu.ops.pallas.block import encoder_stack_fused as _k
    y = _k(patches, enc, wemb, base, lnf, num_heads=num_heads, sp=sp,
           scale=scale, seq_len=seq_len, eps=eps, interpret=interpret)
    return y, (patches, enc, wemb, base, lnf)


def _encoder_stack_fused_bwd(num_heads, sp, scale, seq_len, eps, interpret,
                             res, g):
    patches, enc, wemb, base, lnf = res
    _, vjp_fn = jax.vjp(
        lambda *a: _stack_fused_composed(*a, num_heads, sp, scale, seq_len,
                                         eps, interpret),
        patches, enc, wemb, base, lnf)
    return vjp_fn(g)


encoder_stack_fused.defvjp(_encoder_stack_fused_fwd,
                           _encoder_stack_fused_bwd)
