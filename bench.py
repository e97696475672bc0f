"""End-to-end benchmark: ViT-B/16 forward throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

Baseline: the reference repo's own published numbers (BASELINE.md) put the
HF PyTorch GPU baseline at 80.3 ms for bs=32 on a 3080 Ti (= 398.5 img/s) —
the bar BASELINE.json says to beat; the reference's Triton path itself is
slower (104.8 ms). ``vs_baseline`` is ours / 398.5 (higher is better).

Timing uses the chained-scan slope method (see vit_tpu/utils/timing.py):
each iteration's input is data-dependent on the previous output, N1- and
N2-long chains run inside one jit, and the per-forward time is the slope —
this cancels the tunneled platform's ~25 ms fixed RPC overhead and the fact
that ``block_until_ready`` does not block on the experimental axon PJRT
plugin. Extra detail (latency, batch sweep) goes to stderr; stdout carries
exactly the one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

# Remote (tunneled) compiles on this platform take minutes; persist compiled
# executables across processes so repeat benches are cheap.
jax.config.update("jax_compilation_cache_dir",
                  __import__("os").environ.get("JAX_COMPILATION_CACHE_DIR",
                                               "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vit_tpu.config import ViTConfig
from vit_tpu.models.vit import forward, init_params
from vit_tpu.utils.timing import bench_chained

HF_GPU_BS32_IMG_PER_SEC = 32 / 0.0803  # BASELINE.md: HF 80.3 ms @ bs=32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def model_ms(cfg: ViTConfig, batch: int, *, impl: str | None = None,
             attention: str = "flash", reps: int = 5) -> float:
    """Steady-state per-forward milliseconds."""
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal(
        (batch, 3, cfg.image_size, cfg.image_size)), cfg.dtype)

    def step(c, params, px):
        # Perturb the input by c*1e-30 (a live data dependency the compiler
        # cannot fold; numerically a no-op) and reduce the output to the
        # next carry so every chained forward is real and serialized.
        x = px * (1.0 + c * 1e-30).astype(cfg.dtype)
        out = forward(params, x, cfg, impl=impl, attention=attention)
        return jnp.mean(out).astype(jnp.float32)

    return bench_chained(step, reps=reps, args=(params, px))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--impl", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--attention", default="flash", choices=["flash", "unfused"])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sweep", action="store_true",
                    help="also run the reference's batch sweep to stderr")
    ap.add_argument("--no-quant", action="store_true",
                    help="skip the int8-tier sidecar measurement")
    args = ap.parse_args()

    # Availability guard: the tunneled TPU service can be down for hours
    # (observed 2026-08-18: 9h+ UNAVAILABLE outage). A child process probes
    # a trivial op; if it can't finish in 5 minutes the real benchmark
    # could not run either, so emit an honest error JSON instead of
    # hanging the driver. (The probe child is killed mid-RPC only in the
    # already-down case.)
    import os
    import subprocess
    ok = True
    if not os.environ.get("VIT_TPU_BENCH_NO_PROBE"):
        try:
            ok = subprocess.run(
                [sys.executable, "-c",
                 "import jax,jax.numpy as jnp;"
                 "(jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()"],
                timeout=300, capture_output=True, check=False
            ).returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
    if not ok:
        log("TPU unreachable (probe failed/timed out) — see "
            "benchmarks/model/Performance.csv for the last measured sweep")
        print(json.dumps({
            "metric": f"vit_b16_images_per_sec_bs{args.batch}_{args.dtype}",
            "value": None, "unit": "images/sec", "vs_baseline": None,
            "error": "tpu_unavailable",
            # Matches the committed benchmarks/model/Performance.csv bs=32
            # row (round-5 drift-gated re-sweep).
            "last_measured_bs32_img_per_s": 4728.4,
        }))
        return

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = ViTConfig(dtype=dtype)
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} | backend: {jax.default_backend()} | "
        f"dtype: {args.dtype} | impl: {args.impl or 'auto'}")

    # Headline: bs=32 throughput (BASELINE.json metric).
    ms = model_ms(cfg, args.batch, impl=args.impl, attention=args.attention,
                  reps=args.reps)
    ips = args.batch / (ms / 1e3)
    log(f"bs={args.batch}: {ms:.3f} ms/forward -> {ips:.1f} img/s "
        f"(reference Triton bs=32: 104.8 ms, HF GPU: 80.3 ms)")

    # Secondary: single-image steady-state latency.
    l1 = model_ms(cfg, 1, impl=args.impl, attention=args.attention,
                  reps=args.reps)
    log(f"bs=1: {l1:.3f} ms/forward "
        f"(reference Triton: 70.9 ms, HF GPU: 4.7 ms)")

    # Secondary: the int8 serving tier (docs/QUANT.md) — fastest path at
    # every batch (s8xs8->s32 on the MXU double-rate path). Reported as a
    # sidecar field; the headline stays the bit-accurate bf16 tier.
    int8_ips = None
    if not args.no_quant:
        try:
            from vit_tpu.quant import forward_quant, quantize_params
            qparams = quantize_params(init_params(jax.random.key(0), cfg))
            rng = np.random.default_rng(0)
            px = jnp.asarray(rng.standard_normal(
                (args.batch, 3, cfg.image_size, cfg.image_size)), cfg.dtype)

            def qstep(c, qparams, px):
                x = px * (1.0 + c * 1e-30).astype(cfg.dtype)
                out = forward_quant(qparams, x, cfg, impl=args.impl)
                return jnp.mean(out).astype(jnp.float32)

            qms = bench_chained(qstep, reps=args.reps, args=(qparams, px))
            int8_ips = round(args.batch / (qms / 1e3), 1)
            log(f"int8 tier bs={args.batch}: {qms:.3f} ms/forward -> "
                f"{int8_ips} img/s")
        except Exception as e:  # never let the sidecar kill the headline
            log(f"int8 tier bench skipped: {e!r}")

    if args.sweep:
        for b in [1, 2, 4, 8, 16, 24, 32, 48, 64]:
            s = model_ms(cfg, b, impl=args.impl, attention=args.attention,
                         reps=args.reps)
            log(f"  sweep bs={b:3d}: {s:8.3f} ms  {b / (s / 1e3):9.1f} img/s")

    out = {
        "metric": f"vit_b16_images_per_sec_bs{args.batch}_{args.dtype}",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / HF_GPU_BS32_IMG_PER_SEC, 2),
    }
    if int8_ips is not None:
        out["int8_tier_images_per_sec"] = int8_ips
    print(json.dumps(out))


if __name__ == "__main__":
    main()
