"""Re-prove tuned plans against the LIVE kernel source, on a real chip.

Tuned entries in ``vit_tpu/ops/pallas/tuned_configs.json`` are valid only
for the kernel-body revision they were measured on: the round-4 minimized
repro (docs/PERF.md §5b) showed a dead-parameter edit to a kernel body
swinging a recorded plan 5.5x — Mosaic's scheduler keys on the emitted
body, not its semantics. ``tuning.lookup`` therefore treats an entry whose
stamped ``rev`` mismatches the live source as a MISS. This tool closes the
loop: it re-times every (filtered) entry's recorded winner with the same
env-forced harness the tuner used, re-stamps ``rev`` + ``_meta.ms`` on
agreement, and FLAGS entries whose time moved beyond the drift band (the
scheduling-cliff signature) instead of silently re-blessing them.

Usage (on TPU):
    python tools/reprove.py                       # all stale block-family entries
    python tools/reprove.py --op encstack --all   # re-time even fresh entries
    python tools/reprove.py --variant H/14
    python tools/reprove.py --canary              # also run the Mosaic-cliff canary

Exit status 1 if any entry regressed past the band (or the canary trips) —
usable as a pre-publish gate.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vit_tpu.config import VARIANTS, ViTConfig
from vit_tpu.ops.pallas import tuning
from vit_tpu.ops.pallas.common import round_up

#: |new - recorded| / recorded beyond which an entry is flagged rather than
#: re-stamped. The platform drifts ±15% run-to-run (PERF.md §5); a Mosaic
#: scheduling collapse is 3-10x — 40% cleanly separates the two.
BAND = 0.40

#: env var that forces each op's plan (same knobs the tuner sweeps).
FORCE_ENV = {
    "matmul": "VIT_TPU_MM_BLOCKS",
    "flash": "VIT_TPU_ATTN_GROUP",
    "flash3d": "VIT_TPU_ATTN_GROUP",
    "mlpblock": "VIT_TPU_MLP_PLAN",
    "mlpblocki8": "VIT_TPU_MLP_PLAN",
    "attnblock": "VIT_TPU_ATTN_PLAN",
    "attnqblock": "VIT_TPU_ATTNQ_PLAN",
    "layerblock": "VIT_TPU_LAYER_PLAN",
    "encstack": "VIT_TPU_STACK_PLAN",
    "encstackq": "VIT_TPU_STACK_PLAN",
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _variant_for(d: int, mlp: int | None, nh: int | None,
                 sp: int | None) -> ViTConfig | None:
    """Map entry dims back to the model geometry they were tuned for."""
    for cfg in VARIANTS.values():
        if cfg.hidden_dim != d:
            continue
        if mlp is not None and cfg.mlp_dim != mlp:
            continue
        if nh is not None and cfg.num_heads != nh:
            continue
        if sp is not None and round_up(cfg.seq_len, 16) != sp:
            continue
        return cfg
    return None


def _batch_from_meta(entry: dict) -> int | None:
    shape = (entry.get("_meta") or {}).get("shape", "")
    if shape.startswith("bs"):
        try:
            return int(shape.split()[0][2:])
        except ValueError:
            return None
    return None


def _force_string(op: str, entry: dict) -> str | None:
    if op == "matmul":
        return f"{entry['bm']},{entry['bn']},{entry['bk']}"
    if op in ("flash", "flash3d"):
        return str(entry["group"])
    if op in ("mlpblock", "mlpblocki8"):
        return f"{entry['bm']},{entry['nt']},{entry['ct']}"
    if op == "attnblock":
        return ("wstream" if entry.get("layout") == "wstream"
                else f"mstream,{entry['group']}")
    if op == "attnqblock":
        return str(entry["group"])
    if op == "layerblock":
        return f"{entry['group']},{entry['ct']}"
    if op in ("encstack", "encstackq"):
        if entry.get("route") == "layers":
            return None  # route decision, nothing to force-time
        return f"{entry['cq']},{entry['mt']},{int(bool(entry.get('flat')))}"
    return None


def _measure(op: str, dtype, dims: tuple[int, ...], entry: dict,
             cfg: ViTConfig | None, batch: int | None) -> float | None:
    """Re-time the recorded winner via the tuner's own sweep harness,
    restricted (by env force) to exactly that candidate."""
    from vit_tpu.bench import tune as T

    force = _force_string(op, entry)
    if force is None:
        return None
    env = FORCE_ENV[op]
    os.environ[env] = force
    try:
        if op == "matmul":
            m, n, kp = dims
            if m == 0:
                if batch is None or cfg is None:
                    return None
                for mm, nn, kk in T.model_matmul_shapes(cfg, batch):
                    if nn == n and round_up(kk, 128) == kp:
                        m = mm
                        break
                else:
                    return None
            return _time_matmul(m, n, kp, dtype)
        if op in ("flash", "flash3d"):
            bh, sp, hd = dims
            if bh == 0:
                if batch is None or cfg is None:
                    return None
                bh = batch * cfg.num_heads
            return _time_flash(bh, sp, hd, dtype, raw=(op == "flash3d"),
                               cfg=cfg)
        if cfg is None or batch is None:
            return None
        sp = round_up(cfg.seq_len, 16)
        if op in ("mlpblock", "mlpblocki8"):
            rows = T.sweep_mlpblock(batch, sp, cfg, dtype,
                                    quant=(op == "mlpblocki8"))
        elif op == "attnblock":
            rows = T.sweep_attnblock(batch, sp, cfg, dtype)
        elif op == "attnqblock":
            rows = T.sweep_attnqblock(batch, sp, cfg, dtype)
        elif op == "layerblock":
            rows = T.sweep_layerblock(batch, sp, cfg, dtype)
        elif op == "encstack":
            rows = T.sweep_encstack(batch, sp, cfg, dtype)
        elif op == "encstackq":
            rows = T.sweep_encstackq(batch, sp, cfg, dtype)
        else:
            return None
        # With the env force pinned, the candidate loop measures ONLY the
        # forced plan (every other candidate resolves to the same env
        # value) — take the fastest observation.
        return min((r["ms"] for r in rows), default=None)
    finally:
        os.environ.pop(env, None)


def _time_matmul(m: int, n: int, kp: int, dtype) -> float | None:
    import numpy as np

    from vit_tpu.bench.tune import _bench
    from vit_tpu.ops.pallas.matmul import matmul
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, kp)) * 0.1, dtype)
    w = jnp.asarray(rng.standard_normal((kp, n)) * 0.1, dtype)
    b = jnp.asarray(rng.standard_normal(n) * 0.1, dtype)

    def step(c, x, w, b):
        out = matmul(x * (1 + c * 1e-30).astype(dtype), w, b)
        return jnp.mean(out).astype(jnp.float32)

    return _bench(step, (x, w, b))


def _time_flash(bh: int, sp: int, hd: int, dtype, raw: bool,
                cfg: ViTConfig | None) -> float | None:
    import numpy as np

    from vit_tpu.bench.tune import _bench
    from vit_tpu.ops.pallas.attention import flash_attention
    s = cfg.seq_len if (raw and cfg is not None) else sp
    rng = np.random.default_rng(0)
    shape = (1, bh, s, hd)
    q = jnp.asarray(rng.standard_normal(shape), dtype)
    k = jnp.asarray(rng.standard_normal(shape), dtype)
    v = jnp.asarray(rng.standard_normal(shape), dtype)

    def step(c, q, k, v):
        out = flash_attention(q * (1 + c * 1e-30).astype(dtype), k, v,
                              seq_len=s)
        return jnp.mean(out).astype(jnp.float32)

    return _bench(step, (q, k, v))


def _parse_key(key: str):
    op, dt, dims = key.split(":")
    return op, dt, tuple(int(x) for x in dims.split("x"))


def entry_geometry(op: str, dims: tuple[int, ...]):
    """(cfg, batch_hint_dims) for an entry key. Returns (cfg|None, sp)."""
    if op == "matmul":
        return None, None
    if op in ("flash", "flash3d"):
        return None, dims[1]
    if op in ("mlpblock", "mlpblocki8"):
        m, d, mlp = dims
        return _variant_for(d, mlp, None, None), None
    if op in ("attnblock", "attnqblock"):
        b, sp, d, nh = dims
        return _variant_for(d, None, nh, sp), sp
    # layerblock / encstack / encstackq: (b, sp, d, mlp, nh)
    b, sp, d, mlp, nh = dims
    return _variant_for(d, mlp, nh, sp), sp


def run_canary() -> bool:
    """The Mosaic scheduling-cliff canary (PERF.md §5b): the minimized
    b=3 encoder-stack core must still show the collapse class bounded —
    and the stable b=2 class must still be fast. Returns True if sane."""
    here = os.path.dirname(os.path.abspath(__file__))
    r = subprocess.run(
        [sys.executable, os.path.join(here, "encstack_minrepro.py"),
         "--variants", "core", "--cases", "2,768,768"],
        capture_output=True, text=True, timeout=1800)
    out = r.stdout + r.stderr
    log(out)
    # The minrepro prints per-case us/layer; the stable class must stay
    # under 120 us/layer (measured ~42-55; collapse is ~290-780).
    import re
    times = [float(x) for x in re.findall(r"([0-9.]+)\s*us/layer", out)]
    if not times:
        log("canary: could not parse minrepro output")
        return False
    ok = min(times) < 120.0
    log(f"canary: stable-class core {min(times):.1f} us/layer "
        f"({'OK' if ok else 'COLLAPSED — kernel revision regressed'})")
    return ok


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--op", default=None, help="only this op family")
    ap.add_argument("--variant", default=None,
                    help="only entries matching this variant's geometry")
    ap.add_argument("--dtype", default=None,
                    choices=[None, "bfloat16", "float32"])
    ap.add_argument("--all", action="store_true",
                    help="re-time entries whose rev is already current "
                         "(default: only stale entries)")
    ap.add_argument("--canary", action="store_true",
                    help="also run the Mosaic scheduling-cliff canary")
    ap.add_argument("--dry-run", action="store_true",
                    help="list what would be re-proven, measure nothing")
    args = ap.parse_args()

    want_cfg = VARIANTS[args.variant] if args.variant else None
    t = tuning.table()
    work, skipped = [], 0
    for key in sorted(t):
        op, dt, dims = _parse_key(key)
        if args.op and op != args.op:
            continue
        if args.dtype and dt != args.dtype:
            continue
        entry = dict(t[key])
        live = tuning.rev(op)
        stale = live is not None and entry.get("rev") != live
        if not stale and not args.all:
            skipped += 1
            continue
        cfg, _sp = entry_geometry(op, dims)
        if want_cfg is not None and (
                cfg is None or cfg.hidden_dim != want_cfg.hidden_dim
                or cfg.mlp_dim != want_cfg.mlp_dim):
            continue
        work.append((key, op, dt, dims, entry, cfg, stale))

    log(f"{len(work)} entries to re-prove ({skipped} already current; "
        f"--all to include them)")
    if args.dry_run:
        for key, *_rest, stale in work:
            log(f"  {'STALE ' if stale else ''}{key}")
        return

    flagged = []
    for key, op, dt, dims, entry, cfg, stale in work:
        dtype = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
        if cfg is not None:
            cfg = cfg.replace(dtype=dtype)
        batch = _batch_from_meta(entry)
        if batch is None and op in ("attnblock", "attnqblock", "layerblock",
                                    "encstack", "encstackq"):
            batch = dims[0] or None
        old = (entry.get("_meta") or {}).get("ms")
        try:
            ms = _measure(op, dtype, dims, entry, cfg, batch)
        except Exception as e:  # noqa: BLE001 — keep re-proving the rest
            log(f"  {key}: measure FAILED ({str(e)[:100]})")
            flagged.append((key, old, None))
            continue
        if ms is None:
            # Route-only entries (encstackq "layers") and underivable
            # geometries: re-stamp route decisions (nothing kernel-body
            # dependent to measure), skip the rest.
            if entry.get("route") == "layers":
                meta = dict(entry.get("_meta") or {})
                val = {k: v for k, v in entry.items()
                       if k not in ("_meta", "rev")}
                tuning.record(op, dtype, dims, val, extra=meta)
                log(f"  {key}: route entry re-stamped")
            else:
                log(f"  {key}: cannot reconstruct geometry — left stale")
            continue
        drift = abs(ms - old) / old if old else 0.0
        status = "OK" if drift <= BAND else "FLAGGED"
        log(f"  {key}: {old} -> {ms:.4f} ms (drift {drift * 100:.0f}%) "
            f"{status}")
        if drift <= BAND:
            meta = dict(entry.get("_meta") or {})
            meta["ms"] = round(ms, 6)
            val = {k: v for k, v in entry.items() if k not in ("_meta", "rev")}
            tuning.record(op, dtype, dims, val, extra=meta)
        else:
            flagged.append((key, old, ms))

    ok = not flagged
    if flagged:
        log("FLAGGED (left un-stamped — the heuristic serves these shapes "
            "until a fresh tune run records a new winner):")
        for key, old, ms in flagged:
            log(f"  {key}: recorded {old} ms, measured "
                f"{'FAIL' if ms is None else f'{ms:.4f} ms'}")
    if args.canary:
        ok = run_canary() and ok
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
