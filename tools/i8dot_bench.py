"""On-chip MLP-block kernel shootout: bf16 vs int8-weight vs int8-dot.

Times the three MLP mega-kernel variants at the model's real shapes
(B/16: d=768, mlp=3072, m = batch * 208 padded tokens) to decide whether
the int8-dot path (s8 x s8 -> s32, the MXU's double-rate mode — confirmed
by tools/int8_probe.py at 244 TOPS vs 132 TF/s bf16) should become the
quant tier's throughput default. Run:

    python tools/i8dot_bench.py [--batches 8 32 64]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

sys.path.insert(0, "/root/repo")

from vit_tpu.ops.pallas.block import (mlp_block, mlp_block_i8dot,
                                      mlp_block_plan, mlp_block_q)
from vit_tpu.quant import quantize_weight
from vit_tpu.utils.timing import bench_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 32, 64])
    ap.add_argument("-D", type=int, default=768)
    ap.add_argument("--mlp", type=int, default=3072)
    ap.add_argument("-S", type=int, default=208)
    args = ap.parse_args()

    d, mlp, s = args.D, args.mlp, args.S
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    g = jnp.asarray(rng.standard_normal(d) * 0.5 + 1, dt)
    be = jnp.asarray(rng.standard_normal(d) * 0.1, dt)
    w1 = jnp.asarray(rng.standard_normal((d, mlp)) * 0.02, dt)
    b1 = jnp.asarray(rng.standard_normal(mlp) * 0.1, dt)
    w2 = jnp.asarray(rng.standard_normal((mlp, d)) * 0.02, dt)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.1, dt)
    q1, q2 = quantize_weight(w1), quantize_weight(w2)

    for b in args.batches:
        m = b * s
        print(f"-- batch {b} (m={m})  plan={mlp_block_plan(m, d, mlp, 2)}",
              file=sys.stderr, flush=True)
        x = jnp.asarray(rng.standard_normal((m, d)), dt)
        tf = 4 * m * d * mlp / 1e12

        def time_one(name, fn):
            def step(c, x):
                return jnp.mean(fn(x * (1 + c * 1e-30).astype(dt))
                                ).astype(jnp.float32)
            ms = bench_chained(step, args=(x,))
            print(f"{name:14s} b={b:3d}  {ms:8.4f} ms  "
                  f"{tf / (ms / 1e3):6.1f} TF/s", flush=True)
            return ms

        time_one("bf16", lambda u: mlp_block(u, g, be, w1, b1, w2, b2))
        time_one("int8-weight", lambda u: mlp_block_q(
            u, g, be, q1["q"], q1["scale"], b1, q2["q"], q2["scale"], b2))
        time_one("int8-dot", lambda u: mlp_block_i8dot(
            u, g, be, q1["q"], q1["scale"], b1, q2["q"], q2["scale"], b2))


if __name__ == "__main__":
    main()
