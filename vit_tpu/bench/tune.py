"""Offline block-config sweep — the TPU answer to the reference's autotuner.

The reference searches 25 matmul configs / 18 add configs *in-process* at
first call (reference vit/kernels/matmul.py:10-39, add.py:7-29), caching per
(M,N,K) key for the life of the process. On this platform a Pallas compile
goes through a remote compile service and can take minutes, so the search
must be offline: this CLI sweeps candidate configs per model shape on a real
chip, times each with the chained-slope harness, and persists winners to
``vit_tpu/ops/pallas/tuned_configs.json`` (consulted by ``_pick_blocks`` /
``_pick_group`` at trace time). A sweep log with every measured config goes
to ``benchmarks/tune/``.

Usage (on TPU):
    python -m vit_tpu.bench.tune --op matmul --dtype bfloat16 --batches 32
    python -m vit_tpu.bench.tune --op flash  --dtype bfloat16 --batches 32 64
"""

from __future__ import annotations

import argparse
import itertools
import json
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

from vit_tpu.config import ViTConfig
from vit_tpu.ops.pallas import tuning
from vit_tpu.ops.pallas.common import round_up
from vit_tpu.utils.timing import NoisyTimingError, bench_chained


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- candidates

def matmul_candidates(m: int, n: int, kp: int, dtype, limit: int):
    """Safe (bm, bn, bk) candidates ranked by a simple time model.

    Model: ``steps x step_overhead + padded_flops / mxu_peak`` — the two
    measured v5e effects are a ~1.5us per-grid-step pipeline bubble (fewer,
    deeper steps win) and tile-quantization waste (6656 rows split as
    8 x 832 wastes nothing; 7 x 1024 wastes 7.7%), so even-split block sizes
    are included alongside the usual powers. VMEM-bounded well below the
    ceiling — allocator-pathological configs HANG this platform's compile
    service; bk always divides kp (K edges are never masked).
    """
    it = jnp.dtype(dtype).itemsize
    # bf16 compiles have been safe well past the conservative heuristic
    # budget; fp32 stays low (allocator-pathological compile-hang risk).
    cap = (int(11.5 * 2**20)) if it <= 2 else (6 * 2**20)
    mp, np_ = round_up(m, 128), round_up(n, 128)
    bms = {min(b, mp) for b in (256, 512, 640, 768, 1024)}
    bms |= {m // s for s in (2, 4, 8, 13, 16, 26)
            if m % s == 0 and (m // s) % 16 == 0 and 256 <= m // s <= 2048}
    bns = {min(b, np_) for b in (256, 512, 768, 1024, 1536)}
    bns |= {n // s for s in (1, 2, 3) if n % s == 0
            and (n // s) % 128 == 0 and n // s <= 2304}
    bks = [b for b in range(128, kp + 1, 128) if kp % b == 0]
    if len(bks) > 4:  # keep the deepest few — shallow K revisits lose
        bks = bks[-4:]

    peak = 1.8e14 if it <= 2 else 4.5e13  # ~v5e sustained MXU
    step_ovh = 1.5e-6

    cands = []
    for bm, bn, bk in itertools.product(sorted(bms), sorted(bns), bks):
        acc = bm * bn * 4 if bk < kp else 0  # nk==1 kernels skip the acc
        vmem = 2 * (bm * bk + bk * bn) * it + acc + 2 * bm * bn * it
        if vmem >= cap:
            continue
        steps = -(-m // bm) * -(-n // bn) * (kp // bk)
        padded_flops = 2 * (-(-m // bm) * bm) * (-(-n // bn) * bn) * kp
        est = steps * step_ovh + padded_flops / peak
        cands.append((est, bm, bn, bk))
    cands.sort()
    return [(bm, bn, bk) for _, bm, bn, bk in cands[:limit]]


def flash_group_candidates(bh: int, sp: int, d: int, dtype):
    it = jnp.dtype(dtype).itemsize
    per_head = 4 * sp * d * it * 2 + sp * sp * 4
    cap = 10 * 2**20
    return [g for g in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48)
            if bh % g == 0 and g * per_head < cap]


# ---------------------------------------------------------------- measuring

def _bench(step, args=()) -> float:
    return bench_chained(step, lengths=(4, 12, 20), reps=3, args=args)


def sweep_matmul(m: int, n: int, k: int, dtype, limit: int):
    from vit_tpu.ops.pallas.matmul import matmul

    kp = round_up(k, 128)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, dtype)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.1, dtype)
    b = jnp.asarray(rng.standard_normal(n) * 0.1, dtype)

    def step(c, x, w, b):
        out = matmul(x * (1 + c * 1e-30).astype(dtype), w, b)
        return jnp.mean(out).astype(jnp.float32)

    rows = []
    for bm, bn, bk in matmul_candidates(m, n, kp, dtype, limit):
        os.environ["VIT_TPU_MM_BLOCKS"] = f"{bm},{bn},{bk}"
        t0 = time.time()
        try:
            ms = _bench(step, (x, w, b))
        except NoisyTimingError as e:
            log(f"  ({bm},{bn},{bk}) NOISY: {e}")
            continue
        finally:
            os.environ.pop("VIT_TPU_MM_BLOCKS", None)
        tflops = 2 * m * n * kp / 1e12 / (ms / 1e3)
        rows.append({"bm": bm, "bn": bn, "bk": bk, "ms": ms,
                     "tflops": tflops})
        log(f"  ({bm},{bn},{bk}) {ms:.4f} ms = {tflops:.1f} TF/s "
            f"[{time.time() - t0:.0f}s]")
    return rows


def sweep_flash(bh: int, s: int, d: int, dtype, raw: bool = False):
    """``raw=False``: pre-padded operands (the model's contract, rows-view
    kernel, tuned op "flash"); ``raw=True``: unaligned S straight from the
    caller (batched-3D kernel, tuned op "flash3d")."""
    from vit_tpu.ops.pallas.attention import flash_attention

    sp = round_up(s, 16)
    rng = np.random.default_rng(0)
    shape = (1, bh, s if raw else sp, d)
    q = jnp.asarray(rng.standard_normal(shape), dtype)
    k = jnp.asarray(rng.standard_normal(shape), dtype)
    v = jnp.asarray(rng.standard_normal(shape), dtype)

    def step(c, q, k, v):
        out = flash_attention(q * (1 + c * 1e-30).astype(dtype), k, v,
                              seq_len=s)
        return jnp.mean(out).astype(jnp.float32)

    rows = []
    for g in flash_group_candidates(bh, sp, d, dtype):
        os.environ["VIT_TPU_ATTN_GROUP"] = str(g)
        t0 = time.time()
        try:
            ms = _bench(step, (q, k, v))
        except NoisyTimingError as e:
            log(f"  group={g} NOISY: {e}")
            continue
        finally:
            os.environ.pop("VIT_TPU_ATTN_GROUP", None)
        tflops = 4 * bh * s * s * d / 1e12 / (ms / 1e3)
        rows.append({"group": g, "ms": ms, "tflops": tflops})
        log(f"  group={g} {ms:.4f} ms = {tflops:.1f} TF/s "
            f"[{time.time() - t0:.0f}s]")
    return rows


def _block_inputs(b: int, sp: int, cfg: ViTConfig, dtype):
    rng = np.random.default_rng(0)
    d, mlp = cfg.hidden_dim, cfg.mlp_dim
    arr = lambda *sh, sc=0.05: jnp.asarray(rng.standard_normal(sh) * sc, dtype)
    x = jnp.asarray(rng.standard_normal((b, sp, d)), dtype)
    x = x.at[:, cfg.seq_len:].set(0)
    return x, arr(d, sc=0.2) + 1, arr(d), arr(d, 3 * d), arr(3 * d), \
        arr(d, d), arr(d), arr(d, mlp), arr(mlp), arr(mlp, d), arr(d)


def sweep_mlpblock(b: int, sp: int, cfg: ViTConfig, dtype,
                   quant: bool = False):
    """Sweep (bm, nt, ct) plans for the MLP half-block mega-kernel at the
    model's row count m = b*sp; bm=0 means whole-m weight streaming.

    ``quant=True`` sweeps the int8-dot kernel (mlp_block_i8dot) over the
    same candidate grid — its per-row activation-quantize VPU work and
    halved weight DMA can shift the winner vs the float kernel (the bf16
    footprint model stays the gate: it over-estimates int8, so every
    admitted config is safe)."""
    from vit_tpu.ops.pallas.block import mlp_block, mlp_block_i8dot

    d, mlp = cfg.hidden_dim, cfg.mlp_dim
    m = b * sp
    it = jnp.dtype(dtype).itemsize
    x, g, be, *_rest, w1, b1, w2, b2 = _block_inputs(b, sp, cfg, dtype)
    if quant:
        from vit_tpu.quant import quantize_weight
        q1, q2 = quantize_weight(w1), quantize_weight(w2)
        wargs = (q1["q"], q1["scale"], b1, q2["q"], q2["scale"], b2)
    else:
        wargs = (w1, b1, w2, b2)
    kern = mlp_block_i8dot if quant else mlp_block

    def est(bm, nt, ct):
        # Same footprint model as mlp_block_plan — env-forced configs
        # BYPASS the plan's budget check, and a VMEM-infeasible Mosaic
        # compile can wedge the platform's compile service for all
        # processes (observed: m=1664 nt=2 weight-streaming, ~27MB).
        bm = bm or round_up(m, 8)
        mt = mlp // nt
        w = (d * mt + mt * d) * it * (1 if nt == 1 else 2)
        io = (2 if bm < m else 1) * 2 * bm * d * it  # x+out, dbuf if nm>1
        return (w + io + bm * d * (it + 4)
                + bm * ct * (4 + it) + (2 * d + 2 * mt + d) * it)

    cands = []
    if m <= 2048:  # weight-streaming candidates
        for nt in (2, 4, 8, 16):
            if mlp % (nt * 128) == 0:
                cands.append((0, nt, min(mlp // nt, 512)))
    else:
        # Row-blocked weight streaming: grid (nm, nt) — each row block
        # refetches the nt weight tiles (x nm weight traffic) but the
        # hidden never exists in HBM and the smaller tiles pipeline
        # DMA/MXU better than one monolithic resident-weight step.
        # Measured: (1024,4,512) at m=4096 runs 195 TF/s (99% of v5e bf16
        # peak) vs 148.8 for the best nt=1 plan. Also the only feasible
        # regime when resident weights exceed VMEM (H/14: 26 MB bf16).
        bms = {bm for bm in (512, 768, 1024, 1664) if bm < m}
        bms |= {m // s for s in (2, 4, 8, 13)
                if m % s == 0 and 512 <= m // s <= 2048 and (m // s) % 8 == 0}
        for bm in sorted(bms):
            for nt in (2, 4, 8):
                if mlp % (nt * 128) == 0:
                    cands.append((bm, nt, min(mlp // nt, 512)))
    for bm in (128, 256, 512):  # activation-streaming candidates
        if bm <= m:
            cands.append((bm, 1, 1024))
            cands.append((bm, 1, 3072 if mlp % 3072 == 0 else mlp))
    # Measured line: est 22.6MB (m=1664 nt=4) compiles and WINS (186 TF/s);
    # est 27.5MB (nt=2) wedges the compile service. Cap between the two.
    limit = 24 * 2**20
    cands = [c for c in cands if est(*c) <= limit]

    def step(c, x, *w):
        out = kern(x * (1 + c * 1e-30).astype(dtype), *w)
        return jnp.mean(out).astype(jnp.float32)

    rows = []
    for bm, nt, ct in cands:
        os.environ["VIT_TPU_MLP_PLAN"] = f"{bm},{nt},{ct}"
        try:
            ms = _bench(step, (x, g, be) + wargs)
        except Exception as e:  # noqa: BLE001 - sweep must survive bad configs
            log(f"  mlp ({bm},{nt},{ct}) FAIL: {str(e)[:80]}")
            continue
        finally:
            os.environ.pop("VIT_TPU_MLP_PLAN", None)
        tflops = 4 * m * d * mlp / 1e12 / (ms / 1e3)
        rows.append({"bm": bm, "nt": nt, "ct": ct, "ms": ms, "tflops": tflops})
        log(f"  mlp ({bm},{nt},{ct}) {ms:.4f} ms = {tflops:.1f} TF/s")
    return rows


def sweep_attnblock(b: int, sp: int, cfg: ViTConfig, dtype):
    """Sweep layouts for the attention half-block mega-kernel at batch b."""
    from vit_tpu.ops.pallas.block import attn_block

    d, nh = cfg.hidden_dim, cfg.num_heads
    x, g, be, wqkv, bqkv, wout, bout, *_ = _block_inputs(b, sp, cfg, dtype)

    it = jnp.dtype(dtype).itemsize
    # VMEM-infeasible forced configs don't just fail — a pathological
    # Mosaic compile can wedge this platform's compile service for ALL
    # processes (observed: fp32 mstream,8). Pre-filter by the same
    # per-batch footprint model the plan uses, against the compiler limit.
    w = (d * 3 * d + d * d) * it
    per_batch = (2 * 2 * sp * d * it + sp * d * (4 + 3 * it)
                 + sp * sp * 8 + sp * d * 4)
    wstream_bytes = (2 * 2 * d * d * it + d * d * it + 6 * b * sp * d * it
                     + sp * d * 8 + sp * sp * 8 + sp * d * 4)
    limit = 26 * 2**20
    cands = ["wstream"] if b <= 8 and wstream_bytes <= limit else []
    cands += [f"mstream,{gr}" for gr in (1, 2, 4, 8)
              if b % gr == 0 and w + gr * per_batch <= limit]

    def step(c, x, *w):
        out = attn_block(x * (1 + c * 1e-30).astype(dtype), *w,
                         num_heads=nh, seq_len=cfg.seq_len)
        return jnp.mean(out).astype(jnp.float32)

    rows = []
    for cand in cands:
        os.environ["VIT_TPU_ATTN_PLAN"] = cand
        try:
            ms = _bench(step, (x, g, be, wqkv, bqkv, wout, bout))
        except Exception as e:  # noqa: BLE001
            log(f"  attn {cand} FAIL: {str(e)[:80]}")
            continue
        finally:
            os.environ.pop("VIT_TPU_ATTN_PLAN", None)
        tflops = (8 * b * sp * d * d + 4 * b * sp * sp * d) / 1e12 / (ms / 1e3)
        rows.append({"cand": cand, "ms": ms, "tflops": tflops})
        log(f"  attn {cand} {ms:.4f} ms = {tflops:.1f} TF/s")
    return rows


def sweep_attnqblock(b: int, sp: int, cfg: ViTConfig, dtype):
    """Sweep group sizes for the int8-projection attention mega-kernel
    (attn_block_q) at batch b — its quantize VPU work per group differs
    from the float kernel's, so the best images-per-grid-step can too."""
    from vit_tpu.ops.pallas.block import attn_block_q, attn_block_q_plan
    from vit_tpu.quant import quantize_weight

    d, nh = cfg.hidden_dim, cfg.num_heads
    x, g, be, wqkv, bqkv, wout, bout, *_ = _block_inputs(b, sp, cfg, dtype)
    qkv, out_q = quantize_weight(wqkv), quantize_weight(wout)
    it = jnp.dtype(dtype).itemsize

    def step(c, x, *w):
        o = attn_block_q(x * (1 + c * 1e-30).astype(dtype), *w,
                         num_heads=nh, seq_len=cfg.seq_len)
        return jnp.mean(o).astype(jnp.float32)

    rows = []
    for gr in (1, 2, 4, 8):
        os.environ["VIT_TPU_ATTNQ_PLAN"] = str(gr)
        try:
            # The plan env is budget-gated inside attn_block_q_plan; an
            # infeasible group returns None and the kernel's assert trips —
            # caught here like any other failed candidate.
            if attn_block_q_plan(b, sp, d, nh, it) is None:
                continue
            ms = _bench(step, (x, g, be, qkv["q"], qkv["scale"], bqkv,
                               out_q["q"], out_q["scale"], bout))
        except Exception as e:  # noqa: BLE001
            log(f"  attnq group={gr} FAIL: {str(e)[:80]}")
            continue
        finally:
            os.environ.pop("VIT_TPU_ATTNQ_PLAN", None)
        tflops = (8 * b * sp * d * d + 4 * b * sp * sp * d) / 1e12 / (ms / 1e3)
        rows.append({"group": gr, "ms": ms, "tflops": tflops})
        log(f"  attnq group={gr} {ms:.4f} ms = {tflops:.1f} TF/s")
    return rows


def sweep_layerblock(b: int, sp: int, cfg: ViTConfig, dtype):
    """Sweep (group, ct) plans for the FULL-layer mega-kernel (attn + MLP
    fused, no inter-half HBM round trip)."""
    from vit_tpu.ops.pallas.block import layer_block, layer_block_plan

    d, mlp, nh = cfg.hidden_dim, cfg.mlp_dim, cfg.num_heads
    it = jnp.dtype(dtype).itemsize
    (x, g, be, wqkv, bqkv, wout, bout,
     w1, b1, w2, b2) = _block_inputs(b, sp, cfg, dtype)
    inputs = (x, g, be, wqkv, bqkv, wout, bout, g, be, w1, b1, w2, b2)

    def step(c, x, *w):
        out = layer_block(x * (1 + c * 1e-30).astype(dtype), *w,
                          num_heads=nh, seq_len=cfg.seq_len)
        return jnp.mean(out).astype(jnp.float32)

    rows = []
    for gr in (1, 2, 4):
        if b % gr:
            continue
        for ct in (mlp, 1024, 512):
            if mlp % ct:
                continue
            os.environ["VIT_TPU_LAYER_PLAN"] = f"{gr},{ct}"
            # Same wedge-avoidance rule as attnblock: only run configs the
            # plan's own VMEM model accepts.
            if layer_block_plan(b, sp, d, mlp, nh, it) is None:
                os.environ.pop("VIT_TPU_LAYER_PLAN", None)
                continue
            try:
                ms = _bench(step, inputs)
            except Exception as e:  # noqa: BLE001
                log(f"  layer ({gr},{ct}) FAIL: {str(e)[:80]}")
                continue
            finally:
                os.environ.pop("VIT_TPU_LAYER_PLAN", None)
            fl = 2 * b * sp * d * (4 * d + 2 * mlp) + 4 * b * sp * sp * d
            tflops = fl / 1e12 / (ms / 1e3)
            rows.append({"group": gr, "ct": ct, "ms": ms, "tflops": tflops})
            log(f"  layer ({gr},{ct}) {ms:.4f} ms = {tflops:.1f} TF/s")
    return rows


def sweep_encstack(b: int, sp: int, cfg: ViTConfig, dtype):
    """Sweep (cq, mt) tile configs for the whole-encoder mega-kernel."""
    from vit_tpu.ops.pallas.block import encoder_stack, encoder_stack_plan

    d, mlp, nh, L = cfg.hidden_dim, cfg.mlp_dim, cfg.num_heads, cfg.num_layers
    rng = np.random.default_rng(0)
    arr = lambda *sh, sc=0.05: jnp.asarray(rng.standard_normal(sh) * sc, dtype)
    x = jnp.asarray(rng.standard_normal((b, sp, d)), dtype)
    x = x.at[:, cfg.seq_len:].set(0)
    enc = {
        "ln1": {"scale": arr(L, d, sc=0.2) + 1, "bias": arr(L, d)},
        "qkv": {"kernel": arr(L, d, 3 * d), "bias": arr(L, 3 * d)},
        "out": {"kernel": arr(L, d, d), "bias": arr(L, d)},
        "ln2": {"scale": arr(L, d, sc=0.2) + 1, "bias": arr(L, d)},
        "fc1": {"kernel": arr(L, d, mlp), "bias": arr(L, mlp)},
        "fc2": {"kernel": arr(L, mlp, d), "bias": arr(L, d)},
    }

    def step(c, x, enc):
        out = encoder_stack(x * (1 + c * 1e-30).astype(dtype), enc,
                            num_heads=nh, seq_len=cfg.seq_len)
        return jnp.mean(out).astype(jnp.float32)

    rows = []
    for cq in (d, d // 2, 3 * d):
        for mt in (1536, 1024, 768, 512):
            # flat=1 runs the same schedule on a 1-D (L*T,) grid — lets
            # Mosaic pipeline weight windows across the layer boundary
            # (round-5 probe: -9.5% on the b=1 core body).
            for flat in (0, 1):
                os.environ["VIT_TPU_STACK_PLAN"] = f"{cq},{mt},{flat}"
                it = jnp.dtype(dtype).itemsize
                if encoder_stack_plan(b, sp, d, mlp, nh, it) is None:
                    os.environ.pop("VIT_TPU_STACK_PLAN", None)
                    continue
                try:
                    ms = _bench(step, (x, enc))
                except Exception as e:  # noqa: BLE001
                    log(f"  encstack ({cq},{mt},{flat}) FAIL: "
                        f"{str(e)[:80]}")
                    continue
                finally:
                    os.environ.pop("VIT_TPU_STACK_PLAN", None)
                rows.append({"cq": cq, "mt": mt, "flat": flat, "ms": ms})
                log(f"  encstack ({cq},{mt},{flat}) {ms:.4f} ms "
                    f"({ms / L * 1e3:.1f} us/layer)")
    return rows


def sweep_encstackq(b: int, sp: int, cfg: ViTConfig, dtype):
    """Stack-vs-layers ROUTE sweep for the int8 tier (op ``encstackq``):
    time the whole-encoder int8 kernel over (cq, mt) candidates AND the
    per-layer stacked int8 path (i8dot + weight-only), on the same
    quantized pytree. Rows carry ``route`` = "stack" or "layers"."""
    from vit_tpu.ops.pallas.block import (attn_block_q_stacked,
                                          encoder_stack_plan_q,
                                          encoder_stack_q,
                                          mlp_block_q_stacked)
    from vit_tpu.quant import quantize_weight

    d, mlp, nh, L = cfg.hidden_dim, cfg.mlp_dim, cfg.num_heads, cfg.num_layers
    rng = np.random.default_rng(0)
    arr = lambda *sh, sc=0.05: jnp.asarray(rng.standard_normal(sh) * sc, dtype)
    x = jnp.asarray(rng.standard_normal((b, sp, d)), dtype)
    x = x.at[:, cfg.seq_len:].set(0)
    qenc = {
        "ln1": {"scale": arr(L, d, sc=0.2) + 1, "bias": arr(L, d)},
        "qkv": {"kernel": quantize_weight(arr(L, d, 3 * d)),
                "bias": arr(L, 3 * d)},
        "out": {"kernel": quantize_weight(arr(L, d, d)), "bias": arr(L, d)},
        "ln2": {"scale": arr(L, d, sc=0.2) + 1, "bias": arr(L, d)},
        "fc1": {"kernel": quantize_weight(arr(L, d, mlp)),
                "bias": arr(L, mlp)},
        "fc2": {"kernel": quantize_weight(arr(L, mlp, d)), "bias": arr(L, d)},
    }

    def stack_step(c, x, qenc):
        out = encoder_stack_q(x * (1 + c * 1e-30).astype(dtype), qenc,
                              num_heads=nh, seq_len=cfg.seq_len)
        return jnp.mean(out).astype(jnp.float32)

    def make_layers_step(i8dot):
        def step(c, x, qenc):
            h = x * (1 + c * 1e-30).astype(dtype)

            def body(h, i):
                kq, ko = qenc["qkv"]["kernel"], qenc["out"]["kernel"]
                h = attn_block_q_stacked(
                    h, qenc["ln1"]["scale"], qenc["ln1"]["bias"],
                    kq["q"], kq["scale"], qenc["qkv"]["bias"],
                    ko["q"], ko["scale"], qenc["out"]["bias"], i,
                    num_heads=nh, seq_len=cfg.seq_len)
                k1, k2 = qenc["fc1"]["kernel"], qenc["fc2"]["kernel"]
                h = mlp_block_q_stacked(
                    h, qenc["ln2"]["scale"], qenc["ln2"]["bias"],
                    k1["q"], k1["scale"], qenc["fc1"]["bias"],
                    k2["q"], k2["scale"], qenc["fc2"]["bias"], i,
                    i8dot=i8dot)
                return h, None

            h, _ = jax.lax.scan(body, h, jnp.arange(L))
            return jnp.mean(h).astype(jnp.float32)
        return step

    it = jnp.dtype(dtype).itemsize
    rows = []
    # Wider grid than the float stack sweep (round-5): the 1-byte weight
    # windows admit (cq, mt) pairs the float footprint vetoes — including
    # the asymmetric big-mt forms — and the int8 winner has differed from
    # the float one at every geometry measured so far. flat=1 additionally
    # tries the 1-D (L*T,) grid (cross-layer window pipelining).
    for cq in (d // 2, d, 3 * d):
        for mt in (2048, 1536, 1024, 768, 512):
            for flat in (0, 1):
                os.environ["VIT_TPU_STACK_PLAN"] = f"{cq},{mt},{flat}"
                ok = encoder_stack_plan_q(b, sp, d, mlp, nh, it) is not None
                if not ok:
                    os.environ.pop("VIT_TPU_STACK_PLAN", None)
                    continue
                try:
                    ms = _bench(stack_step, (x, qenc))
                except Exception as e:  # noqa: BLE001
                    log(f"  encstackq ({cq},{mt},{flat}) FAIL: "
                        f"{str(e)[:80]}")
                    continue
                finally:
                    os.environ.pop("VIT_TPU_STACK_PLAN", None)
                rows.append({"route": "stack", "cq": cq, "mt": mt,
                             "flat": flat, "ms": ms})
                log(f"  encstackq stack ({cq},{mt},{flat}) {ms:.4f} ms")
    for i8dot in (True, False):
        try:
            ms = _bench(make_layers_step(i8dot), (x, qenc))
        except Exception as e:  # noqa: BLE001
            log(f"  encstackq layers(i8dot={i8dot}) FAIL: {str(e)[:80]}")
            continue
        rows.append({"route": "layers", "i8dot": i8dot, "ms": ms})
        log(f"  encstackq layers(i8dot={i8dot}) {ms:.4f} ms")
    return rows


# ------------------------------------------------------------------- driver

def model_matmul_shapes(cfg: ViTConfig, batch: int) -> list[tuple[int, int, int]]:
    sp = round_up(cfg.seq_len, 16)
    m, d, mlp = batch * sp, cfg.hidden_dim, cfg.mlp_dim
    return [
        (m, 3 * d, d),            # fused QKV
        (m, d, d),                # attention output projection
        (m, mlp, d),              # fc1 (+gelu)
        (m, d, mlp),              # fc2
        (batch * cfg.num_patches, d, cfg.patch_dim),  # patch embed
    ]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--op", default="all",
                    choices=["matmul", "flash", "block", "layer", "quant",
                             "encstack", "encstackq", "all"])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batches", type=int, nargs="*", default=[32],
                    help="model batch sizes to tune (empty list = only "
                         "--squares shapes)")
    ap.add_argument("--limit", type=int, default=10,
                    help="max matmul configs per shape")
    ap.add_argument("--squares", type=int, nargs="*", default=[],
                    help="extra square MxNxK shapes to tune (e.g. 4096)")
    ap.add_argument("--wildcard-batch", type=int, default=32,
                    help="batch whose winners also become m=0 wildcards")
    ap.add_argument("--variant", default="B/16",
                    help="model variant whose shapes to tune (see "
                         "vit_tpu.config.VARIANTS)")
    args = ap.parse_args()

    from vit_tpu.config import VARIANTS
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = VARIANTS[args.variant].replace(dtype=dtype)
    sweep_log: dict = {"dtype": args.dtype, "variant": args.variant,
                       "device": str(jax.devices()[0]),
                       "sweeps": []}

    if args.op in ("matmul", "all"):
        shapes = []
        for b in args.batches:
            for shp in model_matmul_shapes(cfg, b):
                shapes.append((shp, b == args.wildcard_batch))
        for s in args.squares:
            shapes.append(((s, s, s), False))
        seen = set()
        for (m, n, k), wildcard in shapes:
            if (m, n, k) in seen:
                continue
            seen.add((m, n, k))
            kp = round_up(k, 128)
            log(f"[matmul {args.dtype}] m={m} n={n} k={k} (kp={kp})")
            rows = sweep_matmul(m, n, k, dtype, args.limit)
            if not rows:
                continue
            best = min(rows, key=lambda r: r["ms"])
            meta = {"ms": round(best["ms"], 6),
                    "tflops": round(best["tflops"], 1)}
            val = {"bm": best["bm"], "bn": best["bn"], "bk": best["bk"]}
            tuning.record("matmul", dtype, (m, n, kp), val, extra=meta)
            if wildcard:
                tuning.record("matmul", dtype, (0, n, kp), val, extra=meta)
            sweep_log["sweeps"].append(
                {"op": "matmul", "shape": [m, n, kp], "rows": rows})
            log(f"  -> winner ({best['bm']},{best['bn']},{best['bk']}) "
                f"{best['tflops']:.1f} TF/s")

    if args.op in ("flash", "all"):
        sp = round_up(cfg.seq_len, 16)
        for op, raw in (("flash", False), ("flash3d", True)):
            if raw and sp == cfg.seq_len:
                continue  # aligned S never takes the 3D path
            for b in args.batches:
                bh = b * cfg.num_heads
                log(f"[{op} {args.dtype}] bh={bh} s={cfg.seq_len} (sp={sp}) "
                    f"d={cfg.head_dim}")
                rows = sweep_flash(bh, cfg.seq_len, cfg.head_dim, dtype,
                                   raw=raw)
                if not rows:
                    continue
                best = min(rows, key=lambda r: r["ms"])
                meta = {"ms": round(best["ms"], 6),
                        "tflops": round(best["tflops"], 1)}
                tuning.record(op, dtype, (bh, sp, cfg.head_dim),
                              {"group": best["group"]}, extra=meta)
                if b == args.wildcard_batch:
                    tuning.record(op, dtype, (0, sp, cfg.head_dim),
                                  {"group": best["group"]}, extra=meta)
                sweep_log["sweeps"].append(
                    {"op": op, "shape": [bh, sp, cfg.head_dim],
                     "rows": rows})
                log(f"  -> winner group={best['group']} "
                    f"{best['tflops']:.1f} TF/s")

    if args.op in ("block", "layer", "encstack", "all"):
        sp = round_up(cfg.seq_len, 16)
        d, mlp, nh = cfg.hidden_dim, cfg.mlp_dim, cfg.num_heads
        sweep_halves = args.op not in ("layer", "encstack")
        for b in args.batches:
            m = b * sp
            layer_ms = 0.0  # best per-layer (mlp+attn) time, encstack's bar
            if not sweep_halves:
                # Layer/encstack-only re-sweep: the bar is the recorded
                # pair times.
                for op_, dims in (("mlpblock", (m, d, mlp)),
                                  ("attnblock", (b, sp, d, nh))):
                    hit = tuning.lookup(op_, dtype, dims)
                    if hit and "_meta" in hit and "ms" in hit["_meta"]:
                        layer_ms += hit["_meta"]["ms"]
                    else:
                        layer_ms = 0.0
                        break
            if sweep_halves:
                log(f"[mlpblock {args.dtype}] m={m} d={d} mlp={mlp}")
                rows = sweep_mlpblock(b, sp, cfg, dtype)
            else:
                rows = []
            if rows:
                best = min(rows, key=lambda r: r["ms"])
                layer_ms += best["ms"]
                tuning.record(
                    "mlpblock", dtype, (m, d, mlp),
                    {"bm": best["bm"], "nt": best["nt"], "ct": best["ct"]},
                    extra={"ms": round(best["ms"], 6),
                           "tflops": round(best["tflops"], 1),
                           "shape": f"bs{b} v5e"})
                sweep_log["sweeps"].append(
                    {"op": "mlpblock", "shape": [m, d, mlp], "rows": rows})
                log(f"  -> winner ({best['bm']},{best['nt']},{best['ct']}) "
                    f"{best['tflops']:.1f} TF/s")
            if sweep_halves:
                log(f"[attnblock {args.dtype}] b={b} sp={sp} d={d}")
                rows = sweep_attnblock(b, sp, cfg, dtype)
            else:
                rows = []
            if rows:
                best = min(rows, key=lambda r: r["ms"])
                layer_ms += best["ms"]
                val = ({"layout": "wstream"} if best["cand"] == "wstream"
                       else {"layout": "mstream",
                             "group": int(best["cand"].split(",")[1])})
                tuning.record("attnblock", dtype, (b, sp, d, nh), val,
                              extra={"ms": round(best["ms"], 6),
                                     "shape": f"bs{b} v5e"})
                sweep_log["sweeps"].append(
                    {"op": "attnblock", "shape": [b, sp, d, nh], "rows": rows})
                log(f"  -> winner {best['cand']}")
            if args.op == "encstack":
                rows = []
            else:
                log(f"[layerblock {args.dtype}] b={b} sp={sp} d={d} "
                    f"mlp={mlp}")
                rows = sweep_layerblock(b, sp, cfg, dtype)
            if rows:
                best = min(rows, key=lambda r: r["ms"])
                sweep_log["sweeps"].append(
                    {"op": "layerblock", "shape": [b, sp, d, mlp, nh],
                     "rows": rows})
                # A recorded entry IS the routing decision (layer_block_plan
                # is opt-in) — record only a genuine win over the tuned
                # attn_block + mlp_block pair.
                if layer_ms and best["ms"] >= layer_ms:
                    log(f"  -> best ({best['group']},{best['ct']}) "
                        f"{best['ms']:.4f} ms LOSES to split pair "
                        f"{layer_ms:.4f} ms — not recorded")
                    tuning.forget("layerblock", dtype, (b, sp, d, mlp, nh))
                else:
                    tuning.record("layerblock", dtype, (b, sp, d, mlp, nh),
                                  {"group": best["group"], "ct": best["ct"]},
                                  extra={"ms": round(best["ms"], 6),
                                         "vs_pair_ms": round(layer_ms, 6),
                                         "shape": f"bs{b} v5e"})
                    log(f"  -> winner ({best['group']},{best['ct']}) "
                        f"{best['tflops']:.1f} TF/s beats pair "
                        f"{layer_ms:.4f} ms")
            if b <= 4 and args.op in ("block", "encstack", "all"):
                # b=3/4 sweeps exist to bisect the Mosaic scheduling cliff
                # that gates encoder_stack_plan to b<=2 (PERF.md §3): every
                # candidate (cq, mt) is measured, and an entry records ONLY
                # on a genuine win over the tuned per-layer pair, so a
                # collapsed config can never capture routing.
                log(f"[encstack {args.dtype}] b={b} sp={sp}")
                rows = sweep_encstack(b, sp, cfg, dtype)
                if rows:
                    best = min(rows, key=lambda r: r["ms"])
                    sweep_log["sweeps"].append(
                        {"op": "encstack", "shape": [b, sp, d, mlp, nh],
                         "rows": rows})
                    # Record only if the stack beats the tuned per-layer
                    # alternative — a recorded entry OVERRIDES the plan
                    # gate, so it must prove itself (the fp32/b>2 stack
                    # hits a Mosaic scheduling cliff).
                    bar = layer_ms * cfg.num_layers
                    if layer_ms and best["ms"] >= bar:
                        log(f"  -> best ({best['cq']},{best['mt']}) "
                            f"{best['ms']:.4f} ms LOSES to per-layer "
                            f"{bar:.4f} ms — not recorded")
                    else:
                        val = {"cq": best["cq"], "mt": best["mt"]}
                        if best.get("flat"):
                            val["flat"] = 1
                        tuning.record("encstack", dtype, (b, sp, d, mlp, nh),
                                      val,
                                      extra={"ms": round(best["ms"], 6),
                                             "shape": f"bs{b} v5e"})
                        log(f"  -> winner ({best['cq']},{best['mt']},"
                            f"flat={best.get('flat', 0)})")

    if args.op in ("quant", "encstackq"):
        # Int8-kernel plans: same candidate grids as the float block
        # sweep, but timed on the int8 kernels and recorded under their
        # own keys (mlpblocki8 / attnqblock) — consulted by
        # mlp_block_plan_i8 / attn_block_q_plan ahead of the shared
        # float winners. --op encstackq skips straight to the
        # stack-vs-layers route sweep (the per-layer int8 entries stay).
        sp = round_up(cfg.seq_len, 16)
        d, mlp, nh = cfg.hidden_dim, cfg.mlp_dim, cfg.num_heads
        for b in args.batches:
            m = b * sp
            if args.op == "encstackq":
                rows = []
            else:
                log(f"[mlpblocki8 {args.dtype}] m={m} d={d} mlp={mlp}")
                rows = sweep_mlpblock(b, sp, cfg, dtype, quant=True)
            if rows:
                best = min(rows, key=lambda r: r["ms"])
                tuning.record(
                    "mlpblocki8", dtype, (m, d, mlp),
                    {"bm": best["bm"], "nt": best["nt"], "ct": best["ct"]},
                    extra={"ms": round(best["ms"], 6),
                           "tflops": round(best["tflops"], 1),
                           "shape": f"bs{b} v5e"})
                sweep_log["sweeps"].append(
                    {"op": "mlpblocki8", "shape": [m, d, mlp], "rows": rows})
                log(f"  -> winner ({best['bm']},{best['nt']},{best['ct']}) "
                    f"{best['tflops']:.1f} TF/s")
            if args.op == "encstackq":
                rows = []
            else:
                log(f"[attnqblock {args.dtype}] b={b} sp={sp} d={d}")
                rows = sweep_attnqblock(b, sp, cfg, dtype)
            if rows:
                best = min(rows, key=lambda r: r["ms"])
                tuning.record("attnqblock", dtype, (b, sp, d, nh),
                              {"group": best["group"]},
                              extra={"ms": round(best["ms"], 6),
                                     "shape": f"bs{b} v5e"})
                sweep_log["sweeps"].append(
                    {"op": "attnqblock", "shape": [b, sp, d, nh],
                     "rows": rows})
                log(f"  -> winner group={best['group']}")
            if b <= 4:
                # Stack-vs-layers route for the int8 tier: the recorded
                # encstackq entry IS the routing decision consulted by
                # encoder_stack_plan_q (a "layers" route falls back to the
                # per-layer stacked int8 kernels).
                log(f"[encstackq {args.dtype}] b={b} sp={sp}")
                rows = sweep_encstackq(b, sp, cfg, dtype)
                if rows:
                    best = min(rows, key=lambda r: r["ms"])
                    meta = {"ms": round(best["ms"], 6), "shape": f"bs{b} v5e"}
                    if best["route"] == "layers":
                        tuning.record("encstackq", dtype,
                                      (b, sp, d, mlp, nh),
                                      {"route": "layers"}, extra=meta)
                        log(f"  -> winner: per-layer stacked int8 "
                            f"(i8dot={best['i8dot']}) {best['ms']:.4f} ms")
                    else:
                        val = {"cq": best["cq"], "mt": best["mt"]}
                        if best.get("flat"):
                            val["flat"] = 1
                        tuning.record("encstackq", dtype,
                                      (b, sp, d, mlp, nh),
                                      val, extra=meta)
                        log(f"  -> winner: stack ({best['cq']},"
                            f"{best['mt']},flat={best.get('flat', 0)}) "
                            f"{best['ms']:.4f} ms")
                    sweep_log["sweeps"].append(
                        {"op": "encstackq", "shape": [b, sp, d, mlp, nh],
                         "rows": rows})

    os.makedirs("benchmarks/tune", exist_ok=True)
    tag = "" if args.variant == "B/16" else \
        f"_{args.variant.replace('/', '_')}"
    path = f"benchmarks/tune/sweep_{args.op}{tag}_{args.dtype}.json"
    # Merge with any prior log at this path: a targeted re-tune (e.g.
    # --batches 128 only) must not drop the other shapes' sweep history.
    try:
        with open(path) as f:
            prior = json.load(f)["sweeps"]
    except (OSError, ValueError, KeyError):
        prior = []
    seen = {(s["op"], tuple(s["shape"])) for s in sweep_log["sweeps"]}
    sweep_log["sweeps"] += [s for s in prior
                            if (s["op"], tuple(s["shape"])) not in seen]
    sweep_log["sweeps"].sort(key=lambda s: (s["op"], s["shape"]))
    with open(path, "w") as f:
        json.dump(sweep_log, f, indent=1)
    log(f"sweep log -> {path}; winners -> {tuning._PATH}")


if __name__ == "__main__":
    main()
