"""Same-process A/B: bf16 vs int8 end-to-end forward, interleaved per batch.

Round-3's int8-vs-bf16 story mixed CSVs from different sessions while the
tunnel chip drifts (documented ±15%, observed 42% on one bs=1 pair across
the a1ca294→a80d4f5 re-sweep). The only comparison that survives the drift
is one measured in a single process, tiers interleaved per batch, each pair
of points minutes apart on the same clocked chip. This probe is the source
of truth for the README/QUANT.md small-batch claims.

Usage (on TPU):
    python tools/ab_int8_bf16.py --batches 1 2 4 8 --rounds 3
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vit_tpu.config import VARIANTS
from vit_tpu.models.vit import forward, init_params
from vit_tpu.quant import forward_quant, quantize_params
from vit_tpu.utils.timing import bench_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="B/16")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--rounds", type=int, default=3,
                    help="independent measurement rounds per (batch, tier)")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    cfg = VARIANTS[args.variant].replace(dtype=jnp.bfloat16)
    params = init_params(jax.random.key(0), cfg)
    qparams = quantize_params(params)
    rng = np.random.default_rng(0)

    results = []
    for b in args.batches:
        px = jnp.asarray(rng.standard_normal(
            (b, 3, cfg.image_size, cfg.image_size)), cfg.dtype)

        def step_f(c, params, px):
            x = px * (1.0 + c * 1e-30).astype(cfg.dtype)
            return jnp.mean(forward(params, x, cfg,
                                    impl=None)).astype(jnp.float32)

        def step_q(c, qparams, px):
            x = px * (1.0 + c * 1e-30).astype(cfg.dtype)
            # impl=None -> pallas on TPU, same resolution the model sweep
            # uses (forward_quant's own default is the XLA tier).
            return jnp.mean(forward_quant(qparams, x, cfg,
                                          impl=None)).astype(jnp.float32)

        f_ms, q_ms = [], []
        for r in range(args.rounds):
            f_ms.append(bench_chained(step_f, reps=args.reps,
                                      args=(params, px)))
            q_ms.append(bench_chained(step_q, reps=args.reps,
                                      args=(qparams, px)))
            print(f"  b={b} round {r}: bf16 {f_ms[-1]:.4f} ms  "
                  f"int8 {q_ms[-1]:.4f} ms", file=sys.stderr, flush=True)
        row = {"batch": b,
               "bf16_ms": round(float(np.median(f_ms)), 4),
               "bf16_spread": [round(min(f_ms), 4), round(max(f_ms), 4)],
               "int8_ms": round(float(np.median(q_ms)), 4),
               "int8_spread": [round(min(q_ms), 4), round(max(q_ms), 4)]}
        row["int8_vs_bf16"] = round(row["bf16_ms"] / row["int8_ms"], 3)
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"variant": args.variant, "rows": results}))


if __name__ == "__main__":
    main()
