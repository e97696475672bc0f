"""Isolate lax.scan stacked-weight overhead on the per-layer kernel path.

Hypothesis (L/16 bs=2 dip, benchmarks/model_L_16): under ``lax.scan`` the
per-layer mega-kernels read weights as dynamic slices of the stacked
(L, ...) params; ``pallas_call`` is opaque to XLA so each slice
materializes as an HBM->HBM copy (~25 MB/layer for L/16 bf16) that the
bs<=1 encoder_stack path never pays (it indexes the stacked arrays
in-kernel via BlockSpec index_map).

Measures, same-run: (a) e2e forward, (b) scan-of-kernels encoder on
stacked params, (c) one layer's kernels standalone x num_layers,
(d) embed + final LN. If (b) - (c) >> 0, the scan copies are the gap.

    python tools/scan_overhead_probe.py --variant L/16 --batch 2
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
from vit_tpu.config import VARIANTS
from vit_tpu.models.vit import embed, forward, init_params
from vit_tpu.utils.timing import bench_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="L/16")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    cfg = VARIANTS[args.variant].replace(dtype=jnp.dtype(args.dtype))
    b, d, mlp, nh = args.batch, cfg.hidden_dim, cfg.mlp_dim, cfg.num_heads
    s = cfg.seq_len
    sp = -(-s // 16) * 16
    dt = cfg.dtype
    params = init_params(jax.random.key(0), cfg)
    enc = params["encoder"]
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal(
        (b, 3, cfg.image_size, cfg.image_size)), dt)
    x0 = jnp.asarray(rng.standard_normal((b, sp, d)) * 0.05, dt)

    def t(fn, *xs, reps=5):
        def step(c, *a):
            out = fn(a[0] * (1 + c * 1e-30).astype(dt), *a[1:])
            return jnp.mean(out).astype(jnp.float32)
        return bench_chained(step, reps=reps, args=xs)

    def layer(x, lp):
        x = ops.attn_block(x, lp["ln1"]["scale"], lp["ln1"]["bias"],
                           lp["qkv"]["kernel"], lp["qkv"]["bias"],
                           lp["out"]["kernel"], lp["out"]["bias"],
                           num_heads=nh, scale=cfg.head_dim ** -0.5,
                           seq_len=s, eps=cfg.layernorm_eps, impl="pallas")
        return ops.mlp_block(x, lp["ln2"]["scale"], lp["ln2"]["bias"],
                             lp["fc1"]["kernel"], lp["fc1"]["bias"],
                             lp["fc2"]["kernel"], lp["fc2"]["bias"],
                             eps=cfg.layernorm_eps, impl="pallas")

    e2e = t(lambda px, p: forward(p, px, cfg, impl="pallas"), px, params)
    print(f"e2e forward            {e2e:8.3f} ms")

    enc_scan = t(lambda x, e: jax.lax.scan(
        lambda h, lp: (layer(h, lp), None), x, e)[0], x0, enc)
    print(f"encoder scan-of-kernels{enc_scan:8.3f} ms")

    lp0 = jax.tree.map(lambda a: a[0], enc)
    one = t(layer, x0, lp0)
    print(f"one layer standalone   {one:8.3f} ms  x{cfg.num_layers} ="
          f" {one * cfg.num_layers:8.3f} ms")
    print(f"scan overhead          {enc_scan - one * cfg.num_layers:8.3f} ms"
          f"  ({(enc_scan - one * cfg.num_layers) / cfg.num_layers * 1e3:6.1f}"
          f" us/layer)")

    # Unrolled python loop over PRE-SPLIT per-layer params (separate arrays,
    # no in-scan dynamic slices) — isolates the slice/copy cost from any
    # per-kernel dispatch cost.
    layers = [jax.tree.map(lambda a, i=i: a[i], enc)
              for i in range(cfg.num_layers)]

    def unrolled(x, layers):
        for lp in layers:
            x = layer(x, lp)
        return x

    unr = t(unrolled, x0, layers)
    print(f"unrolled pre-split     {unr:8.3f} ms")

    # Unrolled python loop slicing the STACKED params with static indices
    # inside the jitted program — the drop-in forward() formulation if the
    # static-slice copies hide behind compute the way pre-split args do.
    def unrolled_sliced(x, e):
        for i in range(cfg.num_layers):
            x = layer(x, jax.tree.map(lambda a, i=i: a[i], e))
        return x

    uns = t(unrolled_sliced, x0, enc)
    print(f"unrolled static-slice  {uns:8.3f} ms")

    emb = t(lambda px, p: embed(p, px, cfg, impl="pallas"), px, params)
    ln = t(lambda x, p: ops.layernorm(
        x, p["ln_final"]["scale"], p["ln_final"]["bias"],
        eps=cfg.layernorm_eps, impl="pallas"), x0, params)
    print(f"embed                  {emb:8.3f} ms")
    print(f"final LN               {ln:8.3f} ms")
    print(f"sum (scan+emb+ln)      {enc_scan + emb + ln:8.3f} ms"
          f"  vs e2e {e2e:.3f}")


if __name__ == "__main__":
    main()
