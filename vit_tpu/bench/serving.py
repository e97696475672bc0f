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

``--mesh DATAxMODEL`` (e.g. ``--mesh 4x2``) serves the same mixed trace
through the MESH plan-executor path (DP x TP) and records
dispatches-per-request — the artifact-level proof of the "multi-bucket
request = ONE dispatch on a mesh" property that ``dryrun_multichip``
asserts. Off-TPU it re-execs itself onto ``data*model`` virtual CPU
devices (the test suite's environment), so the dispatch accounting — the
mesh-serving claim — is measured without an N-chip pod; img/s from that
mode is CPU-virtual and labeled as such, not a TPU number.
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
    ap.add_argument("--unseen", type=int, default=27,
                    help="non-bucket batch size for the recompile probe "
                         "(pick one never compiled on this compile service: "
                         "its server-side cache survives cold client caches)")
    ap.add_argument("--out-root", default="benchmarks")
    ap.add_argument("--mesh", default=None, metavar="DATAxMODEL",
                    help="serve over a (data, model) mesh (e.g. 4x2); "
                         "off-TPU this re-execs onto data*model virtual "
                         "CPU devices and records dispatches-per-request")
    args = ap.parse_args(argv)

    if args.mesh:
        return main_mesh(args, argv)

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
    # The request array is materialized OUTSIDE the timed region (a device
    # slice to a never-seen shape is itself a compile+dispatch) and the
    # device queue is drained first — otherwise both sides absorb the same
    # foreign costs and the comparison collapses to 1x (observed).
    unseen = args.unseen  # not a bucket; e.g. 27 -> plan [16, 8, 4]
    req = jax.device_put(np.asarray(pool[:unseen]))
    np.asarray(pred(req[: pred.buckets[0]]))  # drain queue (hard sync)
    t0 = time.perf_counter()
    np.asarray(pred(req))
    bucket_ms = (time.perf_counter() - t0) * 1e3
    # Second call: the steady-state cost once the request shape's slice
    # dispatches are cached too (the first call above still pays those).
    t0 = time.perf_counter()
    np.asarray(pred(req))
    bucket_warm_ms = (time.perf_counter() - t0) * 1e3

    # Naive baseline: what an endpoint WITHOUT buckets pays on a shape it
    # has never served — a fresh XLA compile. Measured in a child process
    # with a cold persistent cache, so neither this process's jit cache nor
    # the shared on-disk cache can hide the compile (through the tunneled
    # compile service that is seconds-to-minutes; the asymmetry vs the
    # warm-bucket path IS the CUDA-graph-equivalent claim being tested).
    if args.tiny:
        fresh = jax.jit(lambda p, x: forward(p, x, cfg, impl=args.impl))
        t0 = time.perf_counter()
        np.asarray(fresh(params, req))
        naive_ms = (time.perf_counter() - t0) * 1e3
    else:
        child = (
            "import os, tempfile, time\n"
            "os.environ['JAX_COMPILATION_CACHE_DIR'] = tempfile.mkdtemp()\n"
            "import numpy as np, jax, jax.numpy as jnp\n"
            "jax.config.update('jax_compilation_cache_dir',\n"
            "                  os.environ['JAX_COMPILATION_CACHE_DIR'])\n"
            "from vit_tpu.config import ViTConfig\n"
            "from vit_tpu.models.vit import forward, init_params\n"
            f"dtype = jnp.{'bfloat16' if dtype == jnp.bfloat16 else 'float32'}\n"
            "cfg = ViTConfig(dtype=dtype)\n"
            "params = init_params(jax.random.key(0), cfg)\n"
            + ("from vit_tpu.quant import forward_quant as forward, "
               "quantize_params\n"
               "params = quantize_params(params)\n" if args.quant else "")
            + "rng = np.random.default_rng(0)\n"
            f"x = jnp.asarray(rng.standard_normal(({unseen}, 3, "
            "cfg.image_size, cfg.image_size)), dtype)\n"
            "np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # backend up\n"
            f"fn = jax.jit(lambda p, x: forward(p, x, cfg, impl={args.impl!r}))\n"
            "t0 = time.perf_counter()\n"
            "np.asarray(fn(params, x))\n"
            "print('NAIVE_MS', (time.perf_counter() - t0) * 1e3)\n"
        )
        import subprocess
        out = subprocess.run([sys.executable, "-c", child],
                             capture_output=True, text=True, check=True)
        naive_ms = float(out.stdout.split("NAIVE_MS")[1].split()[0])
    log(f"unseen bs={unseen}: bucketed {bucket_ms:.1f} ms first / "
        f"{bucket_warm_ms:.1f} ms warm vs naive-jit first call "
        f"{naive_ms:.1f} ms ({naive_ms / bucket_warm_ms:.0f}x warm)")

    # 2. Steady-state mixed trace throughput. Since round 3 each request is
    # ONE fused dispatch (Predictor plan executors), so the trace costs
    # len(TRACE) round trips, not one per bucket chunk. Warm each plan's
    # executor first (compile is a one-time cost the recompile probe above
    # already characterizes).
    for n in sorted(set(TRACE)):
        np.asarray(pred(pool[:n]))
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
    # The platform's fixed per-round-trip cost: median wall time of a
    # trivial synced call. The trace pays ~1 of these per request (fused
    # dispatch) + 1 final sync; rpc_floor_ms x requests is the harness/
    # platform floor no serving-layer change can go below.
    noop = jax.jit(lambda v: v + 1)
    np.asarray(noop(jnp.float32(0)))
    floor = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(noop(jnp.float32(0)))
        floor.append(time.perf_counter() - t0)
    rpc_floor_ms = float(np.median(floor)) * 1e3
    log(f"mixed trace ({len(TRACE)} requests, {n_img} imgs): "
        f"{trace_s * 1e3:.1f} ms median -> {ips:.0f} img/s end-to-end "
        f"(incl. host orchestration + RPC; platform round-trip floor "
        f"{rpc_floor_ms:.1f} ms/call x {len(TRACE)} requests = "
        f"{rpc_floor_ms * len(TRACE):.0f} ms of the total)")

    rows = [{
        "metric": "mixed_trace", "quant": int(args.quant),
        "requests": len(TRACE), "images": n_img,
        "median_ms": round(trace_s * 1e3, 2), "img_per_s": round(ips, 1),
        "unseen_batch": unseen,
        "unseen_bucketed_first_ms": round(bucket_ms, 2),
        "unseen_bucketed_warm_ms": round(bucket_warm_ms, 2),
        "unseen_naive_jit_ms": round(naive_ms, 2),
        "warm_all_buckets_s": round(warm_s, 2),
        "rpc_floor_ms_per_call": round(rpc_floor_ms, 2),
        "rpc_floor_trace_ms": round(rpc_floor_ms * len(TRACE), 1),
    }]
    rows = _merge_serving_rows(args.out_root, rows)
    write_perf_report("serving", rows, x_key="requests",
                      y_keys=["img_per_s"], y_label="img/s",
                      out_root=args.out_root, plot=False)
    log(f"wrote {args.out_root}/serving/Performance.csv ({len(rows)} rows)")


def _merge_serving_rows(out_root: str, new_rows: list[dict]) -> list[dict]:
    """Append/replace rows in the serving artifact by (metric, quant, mesh)
    identity — the mesh row must not clobber the on-TPU trace row."""
    import csv

    path = os.path.join(out_root, "serving", "Performance.csv")
    ident = lambda r: (r.get("metric"), str(r.get("quant", "")),
                       str(r.get("mesh", "") or ""))
    new_ids = {ident(r) for r in new_rows}
    rows: list[dict] = []
    try:
        with open(path, newline="") as f:
            rows = [r for r in csv.DictReader(f) if ident(r) not in new_ids]
    except OSError:
        pass
    return rows + new_rows


def main_mesh(args, argv):
    """The mixed trace through the mesh plan-executor path, with measured
    dispatches-per-request (the ``dryrun_multichip`` "multi-bucket
    1-dispatch" coverage item, now in the artifact)."""
    data, model = map(int, args.mesh.lower().split("x"))
    need = data * model
    if jax.device_count() < need:
        # Off-TPU (or too few chips): switch this process onto `need`
        # virtual CPU devices — the exact environment the mesh test suite
        # runs in. In-process (clear_backends + jax_num_cpu_devices), not
        # via env re-exec: this container's sitecustomize pins the axon
        # TPU platform regardless of JAX_PLATFORMS in the environment
        # (same technique as __graft_entry__.dryrun_multichip).
        import jax.extend.backend as _jeb
        _jeb.clear_backends()
        jax.config.update("jax_num_cpu_devices", need)
        jax.config.update("jax_platforms", "cpu")
        assert jax.device_count() >= need, jax.devices()
        log(f"switched to {need} virtual CPU devices for mesh {args.mesh}")

    from vit_tpu.parallel import make_mesh
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    platform = jax.devices()[0].platform
    # Model geometry: the mesh-test-suite size off-TPU (interpret-mode
    # Pallas at full B/16 is minutes per forward on CPU), full size on a
    # real multi-chip platform.
    if platform == "tpu" and not args.tiny:
        cfg = ViTConfig(dtype=dtype)
    else:
        cfg = ViTConfig(image_size=32, patch_size=16, hidden_dim=128,
                        num_heads=4, num_layers=2, mlp_dim=256, dtype=dtype)
        args.repeats = min(args.repeats, 3)
    params = init_params(jax.random.key(0), cfg)
    mesh = make_mesh(data=data, model=model)
    log(f"mesh serving: {platform} x{jax.device_count()} | mesh "
        f"data={data} model={model} | impl {args.impl} | "
        f"geometry d={cfg.hidden_dim} L={cfg.num_layers}")

    pred = Predictor(params, cfg, impl=args.impl, quant=args.quant,
                     mesh=mesh)
    # Instrument the plan-executor boundary: every compiled executor call
    # IS one runtime dispatch of the whole request.
    counts = {"dispatches": 0}
    orig = pred._plan_executor

    def counting_executor(sig):
        fn = orig(sig)

        def wrapped(*a, **k):
            counts["dispatches"] += 1
            return fn(*a, **k)
        return wrapped

    pred._plan_executor = counting_executor

    rng = np.random.default_rng(0)
    pool = jnp.asarray(rng.standard_normal(
        (max(TRACE), 3, cfg.image_size, cfg.image_size)), dtype)
    # Warm every distinct request size (compile once).
    for n in sorted(set(TRACE)):
        np.asarray(pred(pool[:n]))
    counts["dispatches"] = 0

    n_img = sum(TRACE)
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        outs = [pred(pool[:n]) for n in TRACE]
        jax.block_until_ready(outs)
        np.asarray(outs[-1])
        times.append(time.perf_counter() - t0)
    trace_s = float(np.median(times))
    reps = len(times)
    dpr = counts["dispatches"] / (reps * len(TRACE))

    # Per-round-trip floor on THIS backend (CPU-virtual: ~sub-ms; the
    # tunneled TPU: ~25-27 ms) — same accounting as the single-chip row.
    noop = jax.jit(lambda v: v + 1)
    np.asarray(noop(jnp.float32(0)))
    floor = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(noop(jnp.float32(0)))
        floor.append(time.perf_counter() - t0)
    rpc_floor_ms = float(np.median(floor)) * 1e3

    log(f"mixed trace on mesh: {len(TRACE)} requests, {n_img} imgs, "
        f"{trace_s * 1e3:.1f} ms median -> {n_img / trace_s:.0f} img/s "
        f"({platform}-virtual), {dpr:.2f} dispatches/request "
        f"(multi-bucket requests incl. {max(TRACE)}+{min(TRACE)}-size "
        f"plans ride ONE executable each)")

    rows = [{
        "metric": "mixed_trace_mesh", "quant": int(args.quant),
        "mesh": f"{data}x{model}", "platform": platform,
        "requests": len(TRACE), "images": n_img,
        "median_ms": round(trace_s * 1e3, 2),
        "img_per_s": round(n_img / trace_s, 1),
        "dispatches_per_request": round(dpr, 3),
        "rpc_floor_ms_per_call": round(rpc_floor_ms, 3),
        "rpc_floor_trace_ms": round(rpc_floor_ms * len(TRACE), 2),
    }]
    all_rows = _merge_serving_rows(args.out_root, rows)
    write_perf_report("serving", all_rows, x_key="requests",
                      y_keys=["img_per_s"], y_label="img/s",
                      out_root=args.out_root, plot=False)
    log(f"wrote {args.out_root}/serving/Performance.csv "
        f"({len(all_rows)} rows)")


if __name__ == "__main__":
    main()
