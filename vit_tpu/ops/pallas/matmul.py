"""Fused linear matmul kernel: ``(..., K) @ (K, N) + bias`` with optional
fused GELU epilogue.

TPU-native equivalent of reference vit/kernels/matmul.py:40-156 (the
workhorse behind every Linear layer: fp32 accumulator, fused bias at
matmul.py:100-102, fused erf-GELU at matmul.py:104-106). Design departures:

- **Batch is flattened into rows.** The reference grids over (B, M-, N-tiles)
  because torch hands it a 3-D tensor; a shared-weight batched matmul *is* a
  2-D matmul, and flattening (B,197,K) to (6304,K) turns 197-row ragged
  tiles into full MXU tiles.
- **K is a sequential grid axis with a VMEM fp32 accumulator** (the standard
  Pallas TPU matmul pipeline) instead of an in-kernel K loop; Mosaic
  double-buffers the HBM->VMEM streams automatically.
- **No autotune**: block sizes follow from VMEM capacity and MXU shape
  (the reference searches 25 configs per shape, reference matmul.py:10-39).
- **L2 swizzling** (reference matmul.py:69) has no TPU analogue — there is
  no L2 to swizzle for; grid order already streams W tiles optimally.

K is zero-padded to the lane multiple when unaligned (e.g. H/14's 588-wide
patch vectors) — zeros contribute nothing to the accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.activations import gelu
from vit_tpu.ops.pallas.common import cdiv, min_sublanes, pad_dim, round_up


def _dot_precision(dtype):
    """fp32 operands multiply at HIGHEST precision (true fp32 via multi-pass
    bf16 on the MXU): ``preferred_element_type`` only fixes the *accumulator*
    dtype — without this, fp32 inputs are multiplied in single-pass bf16
    (measured max-abs-err 0.29 vs 1.9e-5 on a 197x768x768 product), which
    breaks the reference's fp32 semantics (reference vit/kernels/matmul.py:92
    uses tf32-or-better). bf16 inputs keep the native fast path."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dtype) == jnp.float32 else None)


def _matmul_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, nk: int,
                   activation: str | None, has_bias: bool, precision):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(k == nk - 1)
    def _():
        r = acc_ref[:]
        if has_bias:
            r = r + b_ref[:].astype(jnp.float32)
        if activation == "gelu":
            r = gelu(r)
        o_ref[:] = r.astype(o_ref.dtype)


def _matmul_kernel_nk1(x_ref, w_ref, b_ref, o_ref, *,
                       activation: str | None, has_bias: bool, precision):
    """Full-K tile (nk == 1): the whole product lands in one MXU pass — no
    VMEM accumulator, no revisit branches, one store. Every ViT model matmul
    (K = 768/3072) takes this path; the deep-tile preference exists because
    per-grid-step pipeline setup dominates shallow revisited tiles on v5e."""
    r = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    if has_bias:
        r = r + b_ref[:].astype(jnp.float32)
    if activation == "gelu":
        r = gelu(r)
    o_ref[:] = r.astype(o_ref.dtype)


def _pick_blocks(m: int, n: int, k: int, itemsize: int):
    """(bm, bn, bk) sized for the MXU with ~<6MB of VMEM live.

    Resolution order: ``VIT_TPU_MM_BLOCKS`` env override -> persisted
    autotune table (vit_tpu/ops/pallas/tuning.py, winners from
    ``python -m vit_tpu.bench.tune`` — the offline equivalent of the
    reference's 25-config in-process search, reference
    vit/kernels/matmul.py:10-39) -> static heuristics.

    The heuristic budget is deliberately conservative: Mosaic double-buffers
    the in/out streams on top of the accumulator, and configs near the VMEM
    ceiling (e.g. 512x512x768 fp32) send its allocator into pathological
    compile times on v5e.
    """
    import os
    override = os.environ.get("VIT_TPU_MM_BLOCKS")
    if override:  # manual tuning escape hatch: "bm,bn,bk"
        bm, bn, bk = (int(v) for v in override.split(","))
        return bm, bn, bk

    from vit_tpu.ops.pallas import tuning
    dtype = {2: jnp.bfloat16, 4: jnp.float32}.get(itemsize, jnp.float32)
    hit = tuning.lookup("matmul", dtype, (m, n, k))
    if hit is not None and k % hit["bk"] == 0:
        # Clamp to this call's extent (wildcard entries are tuned at one m).
        return (min(hit["bm"], round_up(m, 128)),
                min(hit["bn"], round_up(n, 128)), hit["bk"])

    # Tuned on v5e (bs=32 ViT-B shapes, see round-1 sweep): per-grid-step
    # pipeline setup is ~us-scale, so deep full-K tiles (nk=1 where
    # possible) and wide-ish N beat many small revisited tiles. bf16 halves
    # stream bytes, so it affords bigger blocks; fp32 keeps the conservative
    # budget (configs near the VMEM ceiling hang this platform's compiler).
    if itemsize <= 2:
        budget, bm0, bn_cap, bk_cap = 10 * 2**20, 640, 768, 1536
    else:
        budget, bm0, bn_cap, bk_cap = 6 * 2**20, 512, 512, 512
    bm = min(bm0, round_up(m, 128))
    bn = min(bn_cap, round_up(n, 128))

    def bk_for(cap: int) -> int:
        # bk MUST divide k exactly (k is pre-padded to a 128 multiple by the
        # launcher): a partial K tile would accumulate out-of-bounds garbage
        # — unlike M/N edges, K edges are NOT masked away by the store.
        for cand in range(min(cap, k) // 128 * 128, 127, -128):
            if k % cand == 0:
                return cand
        return 128

    bk = bk_for(bk_cap)
    # Live VMEM ~ 2*(bm*bk + bk*bn)*itemsize (double-buffered streams)
    # + bm*bn*4 (fp32 accumulator — only when K is revisited, see
    # _matmul_kernel_nk1) + 2*bm*bn*itemsize (double-buffered output).
    while (2 * (bm * bk + bk * bn) * itemsize
           + (bm * bn * 4 if bk < k else 0)
           + 2 * bm * bn * itemsize) >= budget:
        if bm >= bn and bm > 128:
            bm //= 2
        elif bn > 128:
            bn //= 2
        elif bk > 128:
            bk = bk_for(bk - 128)
        else:
            break
    return bm, bn, bk


def matmul(x: jax.Array, w: jax.Array, bias: jax.Array | None = None,
           activation: str | None = None, *,
           interpret: bool = False) -> jax.Array:
    """``x @ w (+ bias) (-> gelu)`` where ``x`` is (..., K), ``w`` is (K, N)."""
    assert x.shape[-1] == w.shape[0], (x.shape, w.shape)
    if activation not in (None, "gelu"):
        raise ValueError(f"unknown activation {activation!r}")
    *lead, k = x.shape
    n = w.shape[1]
    xf = x.reshape(-1, k)
    m = xf.shape[0]

    # Zero-pad unaligned K (see module docstring).
    xf, _ = pad_dim(xf, 1, 128)
    wp, _ = pad_dim(w, 0, 128)
    kp = xf.shape[1]

    bm, bn, bk = _pick_blocks(m, n, kp, x.dtype.itemsize)
    assert kp % bk == 0, (kp, bk)  # K edges must never be partial
    nk = kp // bk
    has_bias = bias is not None
    b2d = (bias if has_bias else jnp.zeros((), x.dtype)).reshape(1, -1) \
        if has_bias else jnp.zeros((1, n), x.dtype)

    if nk == 1:
        kernel = functools.partial(_matmul_kernel_nk1, activation=activation,
                                   has_bias=has_bias,
                                   precision=_dot_precision(x.dtype))
        grid = (cdiv(m, bm), cdiv(n, bn))
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        scratch = []
        semantics = ("parallel", "parallel")
    else:
        kernel = functools.partial(_matmul_kernel, nk=nk,
                                   activation=activation, has_bias=has_bias,
                                   precision=_dot_precision(x.dtype))
        grid = (cdiv(m, bm), cdiv(n, bn), nk)
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
        semantics = ("parallel", "parallel", "arbitrary")

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kp,
            bytes_accessed=(m * kp + kp * n + m * n) * x.dtype.itemsize,
            transcendentals=m * n if activation == "gelu" else 0),
        interpret=interpret,
    )(xf, wp, b2d)
    return out.reshape(*lead, n)


def _fused_linear_kernel(*refs, nk: int, activation: str | None,
                         has_bias: bool, has_ln: bool, has_res: bool,
                         precision):
    """matmul with optional LN prologue (precomputed row stats) and optional
    residual-add epilogue. Operand order (presence per flags):
    x, w, [bias], [mu, rstd, gamma, beta], [residual], out, acc."""
    it = iter(refs)
    x_ref, w_ref = next(it), next(it)
    b_ref = next(it) if has_bias else None
    if has_ln:
        mu_ref, rs_ref, g_ref, be_ref = (next(it) for _ in range(4))
    res_ref = next(it) if has_res else None
    o_ref, acc_ref = next(it), next(it)

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    if has_ln:
        # Normalize this K-tile in fp32: (x - mu) * rstd * gamma + beta.
        # gamma/beta are zero-padded past the true K, so padded columns
        # contribute exactly 0 to the accumulator.
        xn = (x.astype(jnp.float32) - mu_ref[:]) * rs_ref[:]
        xn = xn * g_ref[:].astype(jnp.float32) + be_ref[:].astype(jnp.float32)
        x = xn.astype(x_ref.dtype)

    acc_ref[:] += jax.lax.dot_general(
        x, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(k == nk - 1)
    def _():
        r = acc_ref[:]
        if has_bias:
            r = r + b_ref[:].astype(jnp.float32)
        if activation == "gelu":
            r = gelu(r)
        if has_res:
            r = r + res_ref[:].astype(jnp.float32)
        o_ref[:] = r.astype(o_ref.dtype)


def _fused_linear_kernel_nk1(*refs, activation: str | None, has_bias: bool,
                             has_ln: bool, has_res: bool, precision):
    """Full-K (nk == 1) fused linear: no accumulator scratch, one store.
    Operand order as in :func:`_fused_linear_kernel` minus ``acc``."""
    it = iter(refs)
    x_ref, w_ref = next(it), next(it)
    b_ref = next(it) if has_bias else None
    if has_ln:
        mu_ref, rs_ref, g_ref, be_ref = (next(it) for _ in range(4))
    res_ref = next(it) if has_res else None
    o_ref = next(it)

    x = x_ref[:]
    if has_ln:
        xn = (x.astype(jnp.float32) - mu_ref[:]) * rs_ref[:]
        xn = xn * g_ref[:].astype(jnp.float32) + be_ref[:].astype(jnp.float32)
        x = xn.astype(x_ref.dtype)

    r = jax.lax.dot_general(
        x, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    if has_bias:
        r = r + b_ref[:].astype(jnp.float32)
    if activation == "gelu":
        r = gelu(r)
    if has_res:
        r = r + res_ref[:].astype(jnp.float32)
    o_ref[:] = r.astype(o_ref.dtype)


def fused_linear(x: jax.Array, w: jax.Array, bias: jax.Array | None = None,
                 activation: str | None = None, *,
                 ln_scale: jax.Array | None = None,
                 ln_bias: jax.Array | None = None,
                 eps: float = 1e-12,
                 residual: jax.Array | None = None,
                 interpret: bool = False) -> jax.Array:
    """``act(LN(x) @ w + bias) + residual`` in one matmul pass.

    The transformer-block fusion the reference's roadmap gestures at
    (reference README.md items 2-4): the layernorm feeding a linear never
    materializes — row stats are precomputed into two (M, 1) vectors
    (vit_tpu/ops/pallas/layernorm.py:layernorm_stats) and the normalization
    happens on each K-tile in VMEM as the matmul streams it; the residual
    add rides the output epilogue. Saves 4 full activation HBM passes per
    fused LN and 2 per fused residual vs the unfused kernel chain.
    """
    assert x.shape[-1] == w.shape[0], (x.shape, w.shape)
    if activation not in (None, "gelu"):
        raise ValueError(f"unknown activation {activation!r}")
    has_ln = ln_scale is not None
    has_res = residual is not None
    has_bias = bias is not None
    *lead, k = x.shape
    n = w.shape[1]
    xf = x.reshape(-1, k)
    m = xf.shape[0]

    operands = []
    in_specs = []

    if has_ln:
        from vit_tpu.ops.pallas.layernorm import layernorm_stats
        assert ln_bias is not None and ln_scale.shape == ln_bias.shape == (k,)
        mu, rstd = layernorm_stats(xf, eps=eps, interpret=interpret)

    xf, _ = pad_dim(xf, 1, 128)
    wp, _ = pad_dim(w, 0, 128)
    kp = xf.shape[1]
    bm, bn, bk = _pick_blocks(m, n, kp, x.dtype.itemsize)
    assert kp % bk == 0, (kp, bk)
    nk = kp // bk

    operands.append(xf)
    in_specs.append(pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                                 memory_space=pltpu.VMEM))
    operands.append(wp)
    in_specs.append(pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                                 memory_space=pltpu.VMEM))
    if has_bias:
        operands.append(bias.reshape(1, n))
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                                     memory_space=pltpu.VMEM))
    if has_ln:
        stat_spec = pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0),
                                 memory_space=pltpu.VMEM)
        vec_spec = pl.BlockSpec((1, bk), lambda i, j, kk: (0, kk),
                                memory_space=pltpu.VMEM)
        operands += [mu, rstd,
                     pad_dim(ln_scale.reshape(1, k), 1, 128)[0],
                     pad_dim(ln_bias.reshape(1, k), 1, 128)[0]]
        in_specs += [stat_spec, stat_spec, vec_spec, vec_spec]
    if has_res:
        rf = residual.reshape(-1, n)
        assert rf.shape == (m, n), (residual.shape, (m, n))
        operands.append(rf)
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                     memory_space=pltpu.VMEM))

    if nk == 1:
        # Full-K tiles: accumulator-free kernel (see _matmul_kernel_nk1);
        # the degenerate K grid axis is kept so the specs stay shared.
        kernel = functools.partial(
            _fused_linear_kernel_nk1, activation=activation,
            has_bias=has_bias, has_ln=has_ln, has_res=has_res,
            precision=_dot_precision(x.dtype))
        scratch = []
    else:
        kernel = functools.partial(
            _fused_linear_kernel, nk=nk, activation=activation,
            has_bias=has_bias, has_ln=has_ln, has_res=has_res,
            precision=_dot_precision(x.dtype))
        scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(m, bm), cdiv(n, bn), nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kp,
            bytes_accessed=(m * kp + kp * n + m * n) * x.dtype.itemsize,
            transcendentals=m * n if activation == "gelu" else 0),
        interpret=interpret,
    )(*operands)
    return out.reshape(*lead, n)


if __name__ == "__main__":
    import argparse

    import numpy as np

    from vit_tpu.bench.artifacts import selftest, write_perf_report
    from vit_tpu.ops import reference
    from vit_tpu.ops.dispatch import interpret_mode
    from vit_tpu.utils.timing import bench_chained

    ap = argparse.ArgumentParser(description="matmul self-test + bench")
    ap.add_argument("-B", type=int, default=4)
    ap.add_argument("-M", type=int, default=197)
    ap.add_argument("-K", type=int, default=768)
    ap.add_argument("-N", type=int, default=3072)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.B, args.M, args.K)) * 0.1, dt)
    w = jnp.asarray(rng.standard_normal((args.K, args.N)) * 0.1, dt)
    b = jnp.asarray(rng.standard_normal(args.N) * 0.1, dt)
    ip = interpret_mode()
    # Reference tolerances: matmul 1e-1 (reference matmul.py:159-192) — ours
    # are tighter because both sides accumulate fp32.
    atol = 1e-3 if dt == jnp.float32 else 5e-2
    selftest("matmul", matmul(x, w, interpret=ip), reference.matmul(x, w),
             atol=atol)
    selftest("matmul+bias", matmul(x, w, b, interpret=ip),
             reference.matmul(x, w, b), atol=atol)
    selftest("matmul+bias+gelu", matmul(x, w, b, "gelu", interpret=ip),
             reference.matmul(x, w, b, "gelu"), atol=atol)

    if args.bench:
        rows = []
        for size in [512, 1024, 1792, 2560, 4096]:
            a = jnp.asarray(rng.standard_normal((1, size, size)) * 0.1, dt)
            ww = jnp.asarray(rng.standard_normal((size, size)) * 0.1, dt)

            # Operands as jit ARGUMENTS, not closure constants (closure
            # capture inflates tunneled measurements ~1.7x).
            def mk(fn):
                def step(c, a, ww):
                    out = fn(a * (1 + c * 1e-30).astype(dt), ww)
                    return jnp.mean(out).astype(jnp.float32)
                return step

            pal = bench_chained(mk(lambda u, v: matmul(u, v)), args=(a, ww))
            xla = bench_chained(mk(reference.matmul), args=(a, ww))
            tflops = 2 * size ** 3 / 1e12
            rows.append({"MNK": size, "pallas_ms": pal, "xla_ms": xla,
                         "pallas_tflops": tflops / (pal / 1e3),
                         "xla_tflops": tflops / (xla / 1e3)})
            print(rows[-1])
        write_perf_report("matmul", rows, x_key="MNK",
                          y_keys=["pallas_tflops", "xla_tflops"],
                          y_label="TFLOP/s")
