"""Per-op time breakdown of the ViT-B/16 forward at model shapes.

Times every hot op at the exact shapes the bs=32 model emits, pallas vs
xla, using the chained-slope harness. The per-layer sum x 12 (+ embed)
should land near the measured end-to-end forward; the per-op deltas show
where the pallas tier loses. Usage:

    python tools/breakdown.py --batch 32 --dtype bfloat16
"""

from __future__ import annotations

import argparse
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

from vit_tpu import ops
from vit_tpu.config import ViTConfig
from vit_tpu.utils.timing import bench_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--seq-pad", type=int, default=208,
                    help="padded token count used on the pallas path")
    ap.add_argument("--blocks", action="store_true",
                    help="time the production-path units (attn_block / "
                         "mlp_block mega-kernels) instead of composed ops")
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    cfg = ViTConfig(dtype=dt)
    b, d, mlp = args.batch, cfg.hidden_dim, cfg.mlp_dim
    s, sp = cfg.seq_len, args.seq_pad
    rng = np.random.default_rng(0)

    def arr(*shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale, dt)

    def t(fn, *xs):
        """steady-state ms of fn(*xs) via the chained harness."""
        def step(c, *a):
            out = fn(a[0] * (1 + c * 1e-30).astype(dt), *a[1:])
            return jnp.mean(out).astype(jnp.float32)
        return bench_chained(step, args=xs)

    rows = []

    def row(name, flops_g, pallas_ms, xla_ms, per_layer=True):
        rows.append((name, flops_g, pallas_ms, xla_ms, per_layer))
        print(f"{name:28s} {flops_g:8.2f} GF  pallas {pallas_ms:8.4f} ms "
              f"({flops_g / pallas_ms:6.1f} TF/s)   xla {xla_ms:8.4f} ms "
              f"({flops_g / xla_ms:6.1f} TF/s)", flush=True)

    mP, mX = b * sp, b * s  # row counts on each path

    if args.blocks:
        # Production-path units: each encoder half-block is ONE kernel.
        h, hd = cfg.num_heads, cfg.head_dim
        g1 = arr(d, scale=1).astype(dt) * 0 + 1
        b1 = arr(d, scale=0)
        xbP = arr(b, sp, d)
        xbX = arr(b, s, d)
        w_qkv, b_qkv = arr(d, 3 * d), arr(3 * d)
        w_o, b_o = arr(d, d), arr(d)
        w1, bb1 = arr(d, mlp), arr(mlp)
        w2, bb2 = arr(mlp, d), arr(d)

        flops_attn = (2 * mP * d * 3 * d + 4 * b * h * sp * sp * hd
                      + 2 * mP * d * d) / 1e9
        row("attn_block (ln+qkv+mha+proj)", flops_attn,
            t(lambda x: ops.attn_block(x, g1, b1, w_qkv, b_qkv, w_o, b_o,
                                       num_heads=h, seq_len=s,
                                       impl="pallas"), xbP),
            t(lambda x: ops.attn_block(x, g1, b1, w_qkv, b_qkv, w_o, b_o,
                                       num_heads=h, seq_len=s,
                                       impl="xla"), xbX))
        flops_mlp = 4 * mP * d * mlp / 1e9
        row("mlp_block (ln+fc1+gelu+fc2)", flops_mlp,
            t(lambda x: ops.mlp_block(x, g1, b1, w1, bb1, w2, bb2,
                                      impl="pallas"), xbP),
            t(lambda x: ops.mlp_block(x, g1, b1, w1, bb1, w2, bb2,
                                      impl="xla"), xbX))

        px = arr(b, 3, cfg.image_size, cfg.image_size)
        wpe, bpe = arr(cfg.patch_dim, d), arr(d)
        row("patch_embed", 2 * b * (s - 1) * cfg.patch_dim * d / 1e9,
            t(lambda x: ops.patch_embed(x, wpe, bpe, cfg.patch_size,
                                        impl="pallas"), px),
            t(lambda x: ops.patch_embed(x, wpe, bpe, cfg.patch_size,
                                        impl="xla"), px),
            per_layer=False)
        xfP, xfX = arr(mP, d), arr(mX, d)
        row("final layernorm", 0.01,
            t(lambda x: ops.layernorm(x, g1, b1, impl="pallas"), xfP),
            t(lambda x: ops.layernorm(x, g1, b1, impl="xla"), xfX),
            per_layer=False)

        L = cfg.num_layers
        tot_p = sum(r[2] * (L if r[4] else 1) for r in rows)
        tot_x = sum(r[3] * (L if r[4] else 1) for r in rows)
        print(f"\nsum (x{L} layers + once-ops):  pallas {tot_p:.3f} ms   "
              f"xla {tot_x:.3f} ms")
        return

    # -- qkv: LN prologue + (m,768)@(768,2304) --------------------------------
    g1, b1 = arr(d, scale=1).astype(dt) * 0 + 1, arr(d, scale=0)
    w_qkv, b_qkv = arr(d, 3 * d), arr(3 * d)
    xP, xX = arr(mP, d), arr(mX, d)
    row("qkv (ln+matmul)", 2 * mP * d * 3 * d / 1e9,
        t(lambda x: ops.fused_linear(x, w_qkv, b_qkv, ln_scale=g1, ln_bias=b1,
                                     impl="pallas"), xP),
        t(lambda x: ops.fused_linear(x, w_qkv, b_qkv, ln_scale=g1, ln_bias=b1,
                                     impl="xla"), xX))

    # -- attention ------------------------------------------------------------
    h, hd = cfg.num_heads, cfg.head_dim
    qP = arr(b, h, sp, hd); kP = arr(b, h, sp, hd); vP = arr(b, h, sp, hd)
    qX = arr(b, h, s, hd); kX = arr(b, h, s, hd); vX = arr(b, h, s, hd)

    def xla_chain(q, k, v):
        # the model's "unfused" xla attention: (B*H,S,d) batched matmul chain
        bb, hh, ss, dd = q.shape
        qf = q.reshape(bb * hh, ss, dd)
        kf = k.reshape(bb * hh, ss, dd)
        vf = v.reshape(bb * hh, ss, dd)
        sc = ops.matmul3(qf, kf.transpose(0, 2, 1), scale=hd ** -0.5, impl="xla")
        pr = ops.softmax(sc, impl="xla")
        return ops.matmul3(pr, vf, impl="xla").reshape(q.shape)

    row("attention", 4 * b * h * sp * sp * hd / 1e9,
        t(lambda q: ops.flash_attention(q, kP, vP, scale=hd ** -0.5,
                                        seq_len=s, impl="pallas"), qP),
        t(lambda q: xla_chain(q, kX, vX), qX))

    # -- out proj + residual --------------------------------------------------
    w_o, b_o = arr(d, d), arr(d)
    resP, resX = arr(mP, d), arr(mX, d)
    row("out proj (+res)", 2 * mP * d * d / 1e9,
        t(lambda x: ops.fused_linear(x, w_o, b_o, residual=resP,
                                     impl="pallas"), xP),
        t(lambda x: ops.fused_linear(x, w_o, b_o, residual=resX,
                                     impl="xla"), xX))

    # -- fc1: LN + (m,768)@(768,3072) + gelu ----------------------------------
    w1, bb1 = arr(d, mlp), arr(mlp)
    row("fc1 (ln+matmul+gelu)", 2 * mP * d * mlp / 1e9,
        t(lambda x: ops.fused_linear(x, w1, bb1, "gelu", ln_scale=g1,
                                     ln_bias=b1, impl="pallas"), xP),
        t(lambda x: ops.fused_linear(x, w1, bb1, "gelu", ln_scale=g1,
                                     ln_bias=b1, impl="xla"), xX))

    # -- fc2: (m,3072)@(3072,768) + residual ----------------------------------
    w2, bb2 = arr(mlp, d), arr(d)
    hP, hX = arr(mP, mlp), arr(mX, mlp)
    row("fc2 (+res)", 2 * mP * mlp * d / 1e9,
        t(lambda x: ops.fused_linear(x, w2, bb2, residual=resP,
                                     impl="pallas"), hP),
        t(lambda x: ops.fused_linear(x, w2, bb2, residual=resX,
                                     impl="xla"), hX))

    # -- patch embed (once) ---------------------------------------------------
    px = arr(b, 3, cfg.image_size, cfg.image_size)
    wpe, bpe = arr(cfg.patch_dim, d), arr(d)
    row("patch_embed", 2 * b * (s - 1) * cfg.patch_dim * d / 1e9,
        t(lambda x: ops.patch_embed(x, wpe, bpe, cfg.patch_size,
                                    impl="pallas"), px),
        t(lambda x: ops.patch_embed(x, wpe, bpe, cfg.patch_size,
                                    impl="xla"), px),
        per_layer=False)

    # -- final layernorm (once) ----------------------------------------------
    row("final layernorm", 0.01,
        t(lambda x: ops.layernorm(x, g1, b1, impl="pallas"), xP),
        t(lambda x: ops.layernorm(x, g1, b1, impl="xla"), xX),
        per_layer=False)

    L = cfg.num_layers
    tot_p = sum(r[2] * (L if r[4] else 1) for r in rows)
    tot_x = sum(r[3] * (L if r[4] else 1) for r in rows)
    print(f"\nsum (x{L} layers + once-ops):  pallas {tot_p:.3f} ms   "
          f"xla {tot_x:.3f} ms")


if __name__ == "__main__":
    main()
