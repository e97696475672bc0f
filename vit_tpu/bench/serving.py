"""On-chip serving benchmark: bucketed compile-once serving vs naive jit.

The reference's roadmap ends at "fix all the tensor sizes" + "use CUDA
graphs to optimize kernel dispatch time" (reference README.md:28-29) — it
never ships either. :class:`vit_tpu.serving.Predictor` is the TPU-native
realization of both: one compiled executable per batch bucket, replayed
forever. This benchmark quantifies the claim on hardware:

1. **Bucket reuse vs recompile** — wall time of serving a batch size the
   process has never seen: the Predictor decomposes it onto warm buckets
   (milliseconds); a naive per-shape ``jit`` pays a fresh XLA compile
   (seconds — minutes through the tunneled compile service).
2. **Steady-state mixed-size throughput** — a fixed request trace of
   assorted sizes served end-to-end, amortized img/s. Timed by wall clock
   over the whole trace with one device sync per repeat: per-call RPC
   overhead on the tunneled platform is real serving cost, not harness
   noise, so it is (correctly) included here, but amortized across the
   trace rather than paid per measurement.

Writes ``benchmarks/serving/Performance.csv`` in the reference's artifact
layout. Usage::

    python -m vit_tpu.bench.serving [--dtype bfloat16] [--impl pallas]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vit_tpu.bench.artifacts import write_perf_report
from vit_tpu.config import ViTConfig
from vit_tpu.models.vit import forward, init_params
from vit_tpu.serving import Predictor

# A mixed request trace (sizes a real endpoint sees: singles, odd lots,
# full batches). Sum = 256 images per repeat.
TRACE = (1, 3, 8, 32, 5, 64, 2, 16, 1, 7, 32, 21, 64)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--impl", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="small config / CPU smoke mode (CI)")
    ap.add_argument("--quant", action="store_true",
                    help="serve the int8 tier (vit_tpu.quant)")
    ap.add_argument("--out-root", default="benchmarks")
    args = ap.parse_args(argv)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.tiny:
        cfg = ViTConfig(image_size=32, patch_size=16, hidden_dim=64,
                        num_heads=4, num_layers=2, mlp_dim=128, dtype=dtype)
        args.repeats = 1
    else:
        cfg = ViTConfig(dtype=dtype)
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    shape = (max(TRACE), 3, cfg.image_size, cfg.image_size)
    pool = jnp.asarray(rng.standard_normal(shape), dtype)

    log(f"device: {jax.devices()[0].device_kind} | impl: {args.impl} "
        f"| dtype: {args.dtype}")

    pred = Predictor(params, cfg, impl=args.impl, quant=args.quant)
    # Warm every bucket once (compile + first execution).
    t0 = time.perf_counter()
    for b in pred.buckets:
        np.asarray(pred(pool[:b]))
    warm_s = time.perf_counter() - t0
    log(f"warmed {len(pred.buckets)} buckets in {warm_s:.1f}s "
        f"(compile amortized once per process; persistent cache across)")

    # 1. Unseen batch size: warm-bucket decomposition vs a fresh jit compile.
    unseen = 27  # not a bucket; plan = [16, 8, 4] -> pad 1
    t0 = time.perf_counter()
    np.asarray(pred(pool[:unseen]))
    bucket_ms = (time.perf_counter() - t0) * 1e3

    fresh = jax.jit(lambda p, x: forward(p, x, cfg, impl=args.impl))
    t0 = time.perf_counter()
    np.asarray(fresh(params, pool[:unseen]))
    naive_ms = (time.perf_counter() - t0) * 1e3
    log(f"unseen bs={unseen}: bucketed {bucket_ms:.1f} ms vs naive-jit "
        f"first call {naive_ms:.1f} ms ({naive_ms / bucket_ms:.0f}x)")

    # 2. Steady-state mixed trace throughput.
    n_img = sum(TRACE)
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        outs = [pred(pool[:n]) for n in TRACE]
        jax.block_until_ready(outs)
        np.asarray(outs[-1])  # hard sync (tunnel: block_until_ready is soft)
        times.append(time.perf_counter() - t0)
    trace_s = float(np.median(times))
    ips = n_img / trace_s
    log(f"mixed trace ({len(TRACE)} requests, {n_img} imgs): "
        f"{trace_s * 1e3:.1f} ms median -> {ips:.0f} img/s end-to-end "
        f"(incl. host orchestration + RPC)")

    rows = [{
        "metric": "mixed_trace", "quant": int(args.quant),
        "requests": len(TRACE), "images": n_img,
        "median_ms": round(trace_s * 1e3, 2), "img_per_s": round(ips, 1),
        "unseen_bs27_bucketed_ms": round(bucket_ms, 2),
        "unseen_bs27_naive_jit_ms": round(naive_ms, 2),
        "warm_all_buckets_s": round(warm_s, 2),
    }]
    write_perf_report("serving", rows, x_key="requests",
                      y_keys=["img_per_s"], y_label="img/s",
                      out_root=args.out_root, plot=False)
    log(f"wrote {args.out_root}/serving/Performance.csv")


if __name__ == "__main__":
    main()
