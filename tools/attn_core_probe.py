"""Dissect the attn_block mega-kernel's attention core on-chip.

The attn core (per-head QK^T -> softmax -> P@V at head_dim 64) is the
slower half-block per FLOP (130 vs the MLP's 156 TF/s at B/16 bs=32, see
docs/PERF.md §1/§5). This probe times surgically modified variants of the
kernel to attribute the cost before optimizing:

- ``full``      — the production core (baseline)
- ``mxu``       — score + context dots only (softmax/mask/div deleted):
                  the MXU-only ceiling of the current per-head formulation
- ``nosm``      — mask+div deleted, exp/max kept (isolates the cheap bits)
- ``projonly``  — LN + QKV + out-proj only (no attention core at all):
                  what the block would cost if the core were free
- ``wide``      — per-head loop replaced by ONE lane-concatenated score
                  dot per pair of heads (contraction still 64; checks
                  whether fewer/larger MXU ops beat 12 small ones)

Round-3 candidates (the "head-major packing" family PERF.md §5 names):

- ``kt``        — K projection produced TRANSPOSED (one (D,D)x(sp,D)
                  dims-((0),(1)) dot -> kT (D, sp)), so every per-head
                  score dot is a natural (M,K)x(K,N) matmul instead of a
                  transposed-rhs dot (checks whether Mosaic pays a
                  relayout for the rhs-transposed q.k^T form)
- ``tcore``     — fully head-major core inside the current (sp, D) block
                  layout: xn transposed once per segment, transposed
                  projections with pre-transposed weights, scores
                  contracted over sublanes, context dot natural with
                  M=head_dim (no 64->128 output-lane padding), transposed
                  out-proj, ONE transpose back at the end
- ``xcore``     — upper bound for a transposed-activation model: the
                  whole block consumes and produces (D, m) activations;
                  zero in-kernel transposes anywhere

Only ``full``/``kt``/``tcore``/``xcore`` are numerically meaningful; the
rest are perf probes.

Usage (on TPU):  python tools/attn_core_probe.py --batch 32 --group 4
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.block import _ln32
from vit_tpu.ops.pallas.matmul import _dot_precision
from vit_tpu.utils.timing import bench_chained


def _core_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                 bout_ref, o_ref, *, eps, d, sp, num_heads, head_dim,
                 scale, seq_len, group, precision, mode):
    for g in range(group):
        rows = slice(g * sp, (g + 1) * sp)
        x32 = x_ref[rows, :].astype(jnp.float32)
        xn = _ln32(x32, g_ref, b_ref, eps).astype(x_ref.dtype)

        proj = {}
        for p_i in range(3):
            if mode == "kt" and p_i == 1:
                continue  # kt produces the K projection transposed below
            cols = slice(p_i * d, (p_i + 1) * d)
            z = jax.lax.dot_general(
                xn, wqkv_ref[:, cols], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            z = z + bqkv_ref[:, cols].astype(jnp.float32)
            proj[p_i] = z.astype(x_ref.dtype)
        q_all, k_all, v_all = proj.get(0), proj.get(1), proj.get(2)

        if mode == "projonly":
            ctx_all = q_all
        elif mode == "addmask":
            # Candidate optimization: the -inf key mask as ONE precomputed
            # additive row (broadcast add per head) instead of iota+where
            # on every (sp, sp) score block; division by l folded into a
            # reciprocal multiply.
            col = jax.lax.broadcasted_iota(jnp.int32, (1, sp), 1)
            mrow = jnp.where(col < seq_len, 0.0, float("-inf"))
            parts = []
            for h in range(num_heads):
                hs = slice(h * head_dim, (h + 1) * head_dim)
                s = jax.lax.dot_general(
                    q_all[:, hs], k_all[:, hs], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision) * scale + mrow
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
                ctx = jax.lax.dot_general(
                    p.astype(x_ref.dtype), v_all[:, hs],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                parts.append((ctx * r).astype(x_ref.dtype))
            ctx_all = jnp.concatenate(parts, axis=1)
        elif mode == "wide":
            parts = []
            for h0 in range(0, num_heads, 2):
                hs2 = slice(h0 * head_dim, (h0 + 2) * head_dim)
                # ONE (sp, 2hd) @ (2hd, sp) dot -> WRONG math (heads mix in
                # the contraction) but the exact MXU shape a 2-head-packed
                # formulation would issue; measures op-count overhead.
                s = jax.lax.dot_general(
                    q_all[:, hs2], k_all[:, hs2], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision) * scale
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                l = jnp.sum(p, axis=-1, keepdims=True)
                ctx = jax.lax.dot_general(
                    (p / l).astype(x_ref.dtype), v_all[:, hs2],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                parts.append(ctx.astype(x_ref.dtype))
            ctx_all = jnp.concatenate(parts, axis=1)
        elif mode == "vsum":
            # Row-sums from the MXU for free: context dot against
            # [V | 1] — the ones column rides the 64->128 lane padding the
            # head_dim-64 dot pays anyway; the separate VPU row-sum
            # reduction disappears.
            parts = []
            one = jnp.ones((sp, 1), x_ref.dtype)
            for h in range(num_heads):
                hs = slice(h * head_dim, (h + 1) * head_dim)
                s = jax.lax.dot_general(
                    q_all[:, hs], k_all[:, hs], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision) * scale
                if seq_len != sp:
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(col < seq_len, s, float("-inf"))
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                vaug = jnp.concatenate([v_all[:, hs], one], axis=1)
                ctx1 = jax.lax.dot_general(
                    p.astype(x_ref.dtype), vaug, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                ctx, l = ctx1[:, :head_dim], ctx1[:, head_dim:]
                parts.append((ctx / l).astype(x_ref.dtype))
            ctx_all = jnp.concatenate(parts, axis=1)
        elif mode == "qcore":
            # Int8 score/context dots (the VERDICT-r2 alternative): q and
            # the softmax probabilities quantized per ROW (max-abs/127,
            # lane-broadcast rescale — cheap), k and v per HEAD (scalar
            # scale, no (sp,1)->(1,sp) relayout needed). s8xs8->s32 runs
            # at 2x the bf16 MXU rate; the softmax stays fp32. Exact-ish
            # math (a quant-tier candidate, not a bf16-tier one).
            parts = []
            for h in range(num_heads):
                hs = slice(h * head_dim, (h + 1) * head_dim)
                qh = q_all[:, hs].astype(jnp.float32)
                kh = k_all[:, hs].astype(jnp.float32)
                vh = v_all[:, hs].astype(jnp.float32)
                aq = jnp.maximum(jnp.max(jnp.abs(qh), axis=-1,
                                         keepdims=True), 1e-12) / 127.0
                ak = jnp.maximum(jnp.max(jnp.abs(kh)), 1e-12) / 127.0
                av = jnp.maximum(jnp.max(jnp.abs(vh)), 1e-12) / 127.0
                qq = jnp.round(qh / aq).astype(jnp.int8)
                kq = jnp.round(kh / ak).astype(jnp.int8)
                vq = jnp.round(vh / av).astype(jnp.int8)
                s32 = jax.lax.dot_general(
                    qq, kq, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                s = s32.astype(jnp.float32) * (aq * (ak * scale))
                if seq_len != sp:
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(col < seq_len, s, float("-inf"))
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                l = jnp.sum(p, axis=-1, keepdims=True)
                ap = jnp.maximum(jnp.max(p, axis=-1, keepdims=True),
                                 1e-12) / 127.0
                pq = jnp.round(p / ap).astype(jnp.int8)
                c32 = jax.lax.dot_general(
                    pq, vq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                ctx = c32.astype(jnp.float32) * (ap * av)
                parts.append((ctx / l).astype(x_ref.dtype))
            ctx_all = jnp.concatenate(parts, axis=1)
        elif mode == "kt":
            # K produced transposed: ONE dims-((0),(1)) dot makes kT (d, sp)
            # head-major in rows, so every score dot below is a NATURAL
            # (M,K)x(K,N) matmul (q (sp,hd) @ kT_h (hd,sp)) instead of the
            # rhs-transposed q.k^T contraction of `full`.
            kcols = slice(d, 2 * d)
            kT = jax.lax.dot_general(
                wqkv_ref[:, kcols], xn, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            # (1,d)->(d,1) relayout is only supported for 32-bit types
            # on Mosaic: go through fp32 BEFORE the column reshape.
            kT = (kT + bqkv_ref[0, kcols].astype(jnp.float32)[:, None]
                  ).astype(x_ref.dtype)
            parts = []
            for h in range(num_heads):
                hs = slice(h * head_dim, (h + 1) * head_dim)
                s = jax.lax.dot_general(
                    q_all[:, hs], kT[hs, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision) * scale
                if seq_len != sp:
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(col < seq_len, s, float("-inf"))
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                l = jnp.sum(p, axis=-1, keepdims=True)
                ctx = jax.lax.dot_general(
                    p.astype(x_ref.dtype), v_all[:, hs],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                parts.append((ctx / l).astype(x_ref.dtype))
            ctx_all = jnp.concatenate(parts, axis=1)
        else:
            parts = []
            for h in range(num_heads):
                hs = slice(h * head_dim, (h + 1) * head_dim)
                s = jax.lax.dot_general(
                    q_all[:, hs], k_all[:, hs], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision) * scale
                if mode in ("full", "maskonly") and seq_len != sp:
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(col < seq_len, s, float("-inf"))
                if mode == "mxu":
                    p, l = s, 1.0
                else:
                    s = s - jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(s)
                    l = (jnp.sum(p, axis=-1, keepdims=True)
                         if mode in ("full", "divonly", "sumonly", "recip",
                                     "bf16div", "alldiv", "mxudiv")
                         else 1.0)
                ctx = jax.lax.dot_general(
                    p.astype(x_ref.dtype), v_all[:, hs],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                if mode == "sumonly":     # sum kept live, division skipped
                    parts.append((ctx + 1e-30 * l).astype(x_ref.dtype))
                elif mode == "recip":     # reciprocal + multiply
                    parts.append((ctx * (1.0 / l)).astype(x_ref.dtype))
                elif mode == "bf16div":   # normalize after the dtype cast
                    parts.append(ctx.astype(x_ref.dtype)
                                 / l.astype(x_ref.dtype))
                elif mode in ("alldiv", "mxudiv"):  # defer normalization
                    parts.append((ctx, l))
                else:
                    parts.append((ctx / l).astype(x_ref.dtype))
            if mode == "mxudiv":
                # Lane-expand 1/l via ONE small MXU dot against a constant
                # block-indicator matrix E (E[h, h*hd:(h+1)*hd] = 1), then
                # one wide multiply — replaces num_heads broadcast-divides.
                ctx_cat = jnp.concatenate([c for c, _ in parts], axis=1)
                linv = 1.0 / jnp.concatenate([l for _, l in parts], axis=1)
                row = jax.lax.broadcasted_iota(jnp.int32, (num_heads, d), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (num_heads, d), 1)
                ex = (col // head_dim == row).astype(jnp.float32)
                linv_b = jax.lax.dot_general(
                    linv, ex, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                ctx_all = (ctx_cat * linv_b).astype(x_ref.dtype)
            elif mode == "alldiv":
                ctx_cat = jnp.concatenate([c for c, _ in parts], axis=1)
                linv = 1.0 / jnp.concatenate([l for _, l in parts], axis=1)
                linv = jnp.broadcast_to(linv[:, :, None],
                                        (linv.shape[0], num_heads,
                                         head_dim)).reshape(-1, d)
                ctx_all = (ctx_cat * linv).astype(x_ref.dtype)
            else:
                ctx_all = jnp.concatenate(parts, axis=1)

        out = jax.lax.dot_general(
            ctx_all.astype(x_ref.dtype), wout_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        o_ref[rows, :] = (out + bout_ref[:].astype(jnp.float32)
                          + x32).astype(o_ref.dtype)


def _tcore_body(xn32, wqkvT_ref, bqkv_ref, woutT_ref, *, d, sp, num_heads,
                head_dim, scale, seq_len, precision, cdtype):
    """Head-major core on an fp32 (d, sp) transposed LN image: transposed
    projections (natural dots against pre-transposed weights), scores
    contracted over sublanes, context with M=head_dim (no 64->128
    output-lane padding), transposed out-proj. Returns fp32 (d, sp)."""
    xnT = xn32.astype(cdtype)
    projT = []
    for p_i in range(3):
        rows_w = slice(p_i * d, (p_i + 1) * d)
        zT = jax.lax.dot_general(
            wqkvT_ref[rows_w, :], xnT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        zT = zT + bqkv_ref[0, rows_w].astype(jnp.float32)[:, None]
        projT.append(zT.astype(cdtype))
    qT, kT, vT = projT

    partsT = []
    for h in range(num_heads):
        hs = slice(h * head_dim, (h + 1) * head_dim)
        sT = jax.lax.dot_general(
            kT[hs, :], qT[hs, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) * scale          # (sp_k, sp_q)
        if seq_len != sp:
            row = jax.lax.broadcasted_iota(jnp.int32, sT.shape, 0)
            sT = jnp.where(row < seq_len, sT, float("-inf"))
        sT = sT - jnp.max(sT, axis=0, keepdims=True)
        pT = jnp.exp(sT)
        l = jnp.sum(pT, axis=0, keepdims=True)    # (1, sp_q) lane vector
        ctxT = jax.lax.dot_general(
            vT[hs, :], pT.astype(cdtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        partsT.append(ctxT * (1.0 / l))
    ctxT_all = jnp.concatenate(partsT, axis=0).astype(cdtype)  # (d, sp)

    return jax.lax.dot_general(
        woutT_ref[:], ctxT_all, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def _tcore_kernel(x_ref, g_ref, b_ref, wqkvT_ref, bqkv_ref, woutT_ref,
                  bout_ref, o_ref, *, eps, d, sp, num_heads, head_dim,
                  scale, seq_len, group, precision):
    """`tcore`: standard (rows, d) block layout outside, head-major core
    inside — ONE transpose in (xn) and one out (the block output)."""
    for g in range(group):
        rows = slice(g * sp, (g + 1) * sp)
        x32 = x_ref[rows, :].astype(jnp.float32)
        xn32 = _ln32(x32, g_ref, b_ref, eps)
        outT = _tcore_body(
            xn32.T, wqkvT_ref, bqkv_ref, woutT_ref, d=d, sp=sp,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            seq_len=seq_len, precision=precision, cdtype=x_ref.dtype)
        out = outT.astype(x_ref.dtype).T.astype(jnp.float32)
        o_ref[rows, :] = (out + bout_ref[:].astype(jnp.float32)
                          + x32).astype(o_ref.dtype)


def _xcore_kernel(x_ref, g_ref, b_ref, wqkvT_ref, bqkv_ref, woutT_ref,
                  bout_ref, o_ref, *, eps, d, sp, num_heads, head_dim,
                  scale, seq_len, group, precision):
    """`xcore`: the whole block consumes and produces (d, m) transposed
    activations — zero in-kernel transposes (upper bound for a
    transposed-activation model layout)."""
    gcol = g_ref[0, :].astype(jnp.float32)[:, None]
    bcol = b_ref[0, :].astype(jnp.float32)[:, None]
    bout_col = bout_ref[0, :].astype(jnp.float32)[:, None]
    for g in range(group):
        cols = slice(g * sp, (g + 1) * sp)
        x32 = x_ref[:, cols].astype(jnp.float32)           # (d, sp)
        mu = jnp.mean(x32, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=0, keepdims=True)
        xn32 = (x32 - mu) * jax.lax.rsqrt(var + eps) * gcol + bcol
        outT = _tcore_body(
            xn32, wqkvT_ref, bqkv_ref, woutT_ref, d=d, sp=sp,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            seq_len=seq_len, precision=precision, cdtype=x_ref.dtype)
        o_ref[:, cols] = (outT + bout_col + x32).astype(o_ref.dtype)


def probe(mode, x, g1, be1, wqkv, bqkv, wout, bout, *, num_heads, seq_len,
          group, shape=None):
    b, sp, d = shape if shape is not None else x.shape
    hd = d // num_heads
    common = dict(eps=1e-12, d=d, sp=sp, num_heads=num_heads,
                  head_dim=hd, scale=hd ** -0.5, seq_len=seq_len,
                  group=group, precision=_dot_precision(x.dtype))
    if mode in ("tcore", "xcore"):
        return _probe_t(mode, x, g1, be1, wqkv, bqkv, wout, bout,
                        common=common, b=b, sp=sp, d=d, group=group)
    kernel = functools.partial(_core_kernel, mode=mode, **common)
    blk = pl.BlockSpec((group * sp, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[blk, vec(d), vec(d),
                  pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM), vec(3 * d),
                  pl.BlockSpec((d, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM), vec(d)],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b * sp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=28 * 2**20),
    )(x.reshape(b * sp, d), g1.reshape(1, d), be1.reshape(1, d), wqkv,
      bqkv.reshape(1, 3 * d), wout, bout.reshape(1, d))
    return out.reshape(b, sp, d)


def _probe_t(mode, x, g1, be1, wqkv, bqkv, wout, bout, *, common, b, sp, d,
             group):
    """pallas_call wrapper for the transposed-core kernels. Weights are
    pre-transposed on the host (free at param-load time in production);
    for `xcore` the activations are handed over already in (d, m) layout
    (main() transposes once outside the bench chain), so the slope times
    the pure transposed block — the honest model for a model whose
    activations live transposed end-to-end."""
    wqkvT, woutT = wqkv.T, wout.T              # (3d, d), (d, d)
    kernel = functools.partial(
        _tcore_kernel if mode == "tcore" else _xcore_kernel, **common)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    wspecs = [
        vec(d), vec(d),
        pl.BlockSpec((3 * d, d), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),              # wqkvT
        vec(3 * d),
        pl.BlockSpec((d, d), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),              # woutT
        vec(d),
    ]
    if mode == "tcore":
        blk = pl.BlockSpec((group * sp, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel, grid=(b // group,),
            in_specs=[blk] + wspecs, out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((b * sp, d), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=28 * 2**20),
        )(x.reshape(b * sp, d), g1.reshape(1, d), be1.reshape(1, d), wqkvT,
          bqkv.reshape(1, 3 * d), woutT, bout.reshape(1, d))
        return out.reshape(b, sp, d)
    # xcore: activations arrive AND leave in (d, m) layout — x must
    # already be (d, b*sp) (main() pre-transposes outside the bench loop).
    assert x.shape == (d, b * sp), x.shape
    blkT = pl.BlockSpec((d, group * sp), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(b // group,),
        in_specs=[blkT] + wspecs, out_specs=blkT,
        out_shape=jax.ShapeDtypeStruct((d, b * sp), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=28 * 2**20),
    )(x, g1.reshape(1, d), be1.reshape(1, d), wqkvT,
      bqkv.reshape(1, 3 * d), woutT, bout.reshape(1, d))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--sp", type=int, default=208)
    ap.add_argument("--seq-len", type=int, default=197)
    ap.add_argument("-D", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--group", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--modes", nargs="+",
                    default=["full", "nosm", "mxu", "wide", "projonly"])
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    B, SP, D = args.batch, args.sp, args.D
    arr = lambda *sh, sc=0.05: jnp.asarray(rng.standard_normal(sh) * sc, dt)
    x = jnp.asarray(rng.standard_normal((B, SP, D)), dt)
    x = x.at[:, args.seq_len:].set(0)
    g1, be1 = arr(D, sc=0.2) + 1, arr(D)
    wqkv, bqkv = arr(D, 3 * D), arr(3 * D)
    wout, bout = arr(D, D), arr(D)

    flops = (8 * B * SP * D * D + 4 * B * SP * SP * D) / 1e12

    for mode in args.modes:
        # xcore consumes/produces (D, m) activations: transpose once,
        # OUTSIDE the timed chain (the honest model for a transposed-
        # activation model layout).
        xin = (x.reshape(B * SP, D).T if mode == "xcore" else x)
        def step(c, x, *w, mode=mode):
            out = probe(mode, x * (1 + c * 1e-30).astype(dt), *w,
                        num_heads=args.heads, seq_len=args.seq_len,
                        group=args.group, shape=(B, SP, D))
            return jnp.mean(out).astype(jnp.float32)
        ms = bench_chained(step, args=(xin, g1, be1, wqkv, bqkv, wout, bout))
        print(f"{mode:10s} {ms:.4f} ms   {flops / (ms / 1e3):6.1f} TF/s "
              f"(nominal-FLOP rate)", flush=True)


if __name__ == "__main__":
    main()
