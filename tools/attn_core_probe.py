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

Only ``full`` is numerically meaningful; the others are perf probes.

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

        proj = []
        for p_i in range(3):
            cols = slice(p_i * d, (p_i + 1) * d)
            z = jax.lax.dot_general(
                xn, wqkv_ref[:, cols], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            z = z + bqkv_ref[:, cols].astype(jnp.float32)
            proj.append(z.astype(x_ref.dtype))
        q_all, k_all, v_all = proj

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


def probe(mode, x, g1, be1, wqkv, bqkv, wout, bout, *, num_heads, seq_len,
          group):
    b, sp, d = x.shape
    hd = d // num_heads
    kernel = functools.partial(
        _core_kernel, eps=1e-12, d=d, sp=sp, num_heads=num_heads,
        head_dim=hd, scale=hd ** -0.5, seq_len=seq_len, group=group,
        precision=_dot_precision(x.dtype), mode=mode)
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
        def step(c, x, *w):
            out = probe(mode, x * (1 + c * 1e-30).astype(dt), *w,
                        num_heads=args.heads, seq_len=args.seq_len,
                        group=args.group)
            return jnp.mean(out).astype(jnp.float32)
        ms = bench_chained(step, args=(x, g1, be1, wqkv, bqkv, wout, bout))
        print(f"{mode:10s} {ms:.4f} ms   {flops / (ms / 1e3):6.1f} TF/s "
              f"(nominal-FLOP rate)", flush=True)


if __name__ == "__main__":
    main()
