"""On-chip attention-block kernel shootout: float vs int8-projection.

Times the attention mega-kernel variants at the model's real shapes
(B/16: d=768, nh=12, sp=208 padded tokens, seq=197) to decide whether
the int8-projection attention kernel (attn_block_q — s8 x s8 -> s32
projections, float softmax core) should serve the quant tier's
attention half instead of the XLA int8 chain. Run:

    python tools/attn_q_bench.py [--batches 8 32 64]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

sys.path.insert(0, "/root/repo")

from vit_tpu.ops import reference as ref
from vit_tpu.ops.pallas.block import (attn_block, attn_block_plan,
                                      attn_block_q, attn_block_q_plan)
from vit_tpu.quant import int8_matmul, quantize_weight
from vit_tpu.utils.timing import bench_chained


def xla_int8_attn(x, g, be, wq, bqkv, wo, bout, *, nh, seq):
    b, sp, d = x.shape
    hd = d // nh
    xn = ref.layernorm(x, g, be, eps=1e-12)
    qkv = int8_matmul(xn, wq, bqkv)
    q, k, v = qkv.reshape(b, sp, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    scores = (q.astype(jnp.float32)
              @ k.astype(jnp.float32).transpose(0, 1, 3, 2) * hd ** -0.5)
    scores = jnp.where(jnp.arange(sp) < seq, scores, -jnp.inf)
    probs = ref.softmax(scores)
    ctx = (probs @ v.astype(jnp.float32)).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, sp, d)
    return x + int8_matmul(ctx, wo, bout)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 32, 64])
    ap.add_argument("-D", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("-S", type=int, default=208)
    ap.add_argument("--seq", type=int, default=197)
    args = ap.parse_args()

    d, nh, sp, seq = args.D, args.heads, args.S, args.seq
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    g = jnp.asarray(rng.standard_normal(d) * 0.5 + 1, dt)
    be = jnp.asarray(rng.standard_normal(d) * 0.1, dt)
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.02, dt)
    bqkv = jnp.asarray(rng.standard_normal(3 * d) * 0.1, dt)
    wout = jnp.asarray(rng.standard_normal((d, d)) * 0.02, dt)
    bout = jnp.asarray(rng.standard_normal(d) * 0.1, dt)
    qq, qo = quantize_weight(wqkv), quantize_weight(wout)

    for b in args.batches:
        print(f"-- batch {b}  float-plan={attn_block_plan(b, sp, d, nh, 2)} "
              f"q-plan={attn_block_q_plan(b, sp, d, nh, 2)}",
              file=sys.stderr, flush=True)
        x = jnp.asarray(rng.standard_normal((b, sp, d)), dt)

        def time_one(name, fn):
            def step(c, x):
                return jnp.mean(fn(x * (1 + c * 1e-30).astype(dt))
                                ).astype(jnp.float32)
            ms = bench_chained(step, args=(x,))
            print(f"{name:12s} b={b:3d}  {ms:8.4f} ms", flush=True)
            return ms

        if attn_block_plan(b, sp, d, nh, 2) is not None:
            time_one("float-krnl", lambda u: attn_block(
                u, g, be, wqkv, bqkv, wout, bout,
                num_heads=nh, seq_len=seq))
        time_one("int8-krnl", lambda u: attn_block_q(
            u, g, be, qq["q"], qq["scale"], bqkv,
            qo["q"], qo["scale"], bout, num_heads=nh, seq_len=seq))
        time_one("xla-int8", lambda u: xla_int8_attn(
            u, g, be, qq, bqkv, qo, bout, nh=nh, seq=seq))


if __name__ == "__main__":
    main()
