"""Transformer-block mega-kernels: whole sub-blocks in one Pallas pass.

The reference composes its model from one kernel per op (78 Triton launches
per layer, SURVEY.md §3.2) and its roadmap ends at per-op fusion. The TPU
redesign goes one structural level further: each half of the encoder block
is ONE kernel, sized so the weights are VMEM-resident and every
intermediate lives and dies on-core:

- :func:`mlp_block` — ``x + fc2(gelu(fc1(LN(x))))``. The (M, mlp_dim)
  hidden activation never exists in HBM. XLA cannot do this fusion (it
  never fuses a matmul into another matmul), so at ViT-B/16 bs=32 it pays
  an ~82 MB HBM round trip per layer for the hidden alone; this kernel's
  HBM traffic is just x + out + weights.
- :func:`attn_block` — ``x + proj(MHA(LN(x)))``. QKV, per-head scores,
  softmax and context all stay in VMEM, and the kernel consumes/produces
  the model's natural lane-packed (S, D) activation layout: no
  (B,H,S,64) head transposes at the XLA level, and no half-empty-lane
  (…,64) arrays ever stored to HBM.

Numerics match the composed op chain exactly-in-structure: LN statistics
in fp32 with eps inside the sqrt (reference vit/kernels/layernorm.py:72-73),
erf-GELU (reference vit/kernels/activations.py), fp32 accumulation on every
MXU op, softmax in fp32 (reference vit/kernels/softmax.py). The composed
ops remain the fallback for geometries whose weights exceed the VMEM
budget (:func:`mlp_block_plan` / :func:`attn_block_plan` return None).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.activations import gelu
from vit_tpu.ops.pallas.common import cdiv, pad_dim, round_up
from vit_tpu.ops.pallas.matmul import _dot_precision

_VMEM_BUDGET = 22 * 2**20  # measured: ~32+ MB usable on v5e (probe: 2x16MB
                           # compiles, 2x20MB is rejected) — 22MB of planned
                           # buffers leaves Mosaic room for its own temps


# ------------------------------------------------------------- mlp block --

def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, xn_ref, acc_ref, *, eps: float, d: int, nt: int,
                nc: int, ct: int, precision, partial: bool = False):
    """One (bm, D) row-block through LN -> fc1 -> gelu -> fc2 -> +x.

    Grid (nm, nt): t streams mlp_dim tiles of w1/w2 (nt == 1 keeps both
    weights fully resident — the B/16 bf16 case). Within a t step the
    hidden is produced in ``nc`` chunks of ``ct`` columns so the fp32
    intermediate stays (bm, ct) instead of (bm, mlp_dim).

    ``partial=True`` is the tensor-parallel form: w1/w2 hold this shard's
    mlp-column slice, the accumulator seeds ZERO (no residual, no b2 —
    both must be added exactly once, after the cross-shard psum), and the
    output is a partial sum to be ``lax.psum``-ed over the 'model' axis.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        x32 = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
        xn = (xn * g_ref[:].astype(jnp.float32)
              + b_ref[:].astype(jnp.float32))
        xn_ref[:] = xn.astype(xn_ref.dtype)
        # Residual and final bias seed the accumulator (zero on the TP
        # partial path — they are added post-psum by the caller).
        acc_ref[:] = (jnp.zeros_like(x32) if partial
                      else x32 + b2_ref[:].astype(jnp.float32))

    xn = xn_ref[:]
    for c in range(nc):
        sl = slice(c * ct, (c + 1) * ct)
        h = jax.lax.dot_general(
            xn, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        h = gelu(h + b1_ref[:, sl].astype(jnp.float32)).astype(xn.dtype)
        acc_ref[:] += jax.lax.dot_general(
            h, w2_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    @pl.when(t == nt - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def mlp_block_plan(m: int, d: int, mlp: int, itemsize: int,
                   budget: int = _VMEM_BUDGET):
    """(bm, nt, ct) for :func:`mlp_block`, or None if no config fits.

    Two regimes, both served by the same kernel:

    - **Weight-streaming** (small m): ``bm == m`` — the whole activation
      plus the fp32 accumulator stay VMEM-resident for the kernel's
      lifetime and the grid's t axis streams mlp-dim weight tiles, so the
      ~(2*d*mlp) weight DMA pipelines with compute instead of stalling a
      single grid step. This is the latency regime: at bs=1 the layer is
      weight-DMA-bound and a nt==1 plan serializes an ~11.5us fetch before
      the first MXU op.
    - **Activation-streaming** (large m): nt == 1 keeps both weights
      resident and the grid's i axis streams row blocks (nt > 1 here would
      refetch weight tiles once per row block).

    Resolution: ``tuning`` table entry (op ``mlpblock``, dims (m, d, mlp),
    m=0 wildcard) -> weight-streaming if m fits -> activation-streaming.
    """
    if d % 128 or mlp % 128:
        return None
    env = os.environ.get("VIT_TPU_MLP_PLAN")
    if env:  # "bm,nt,ct" (bm=0 -> whole m) — tune.py's config forcing.
        # Still budget-gated: a VMEM-infeasible Mosaic compile can wedge
        # this platform's compile service for ALL processes.
        bm, nt, ct = map(int, env.split(","))
        bm = bm or round_up(m, 8)
        mt = mlp // nt
        w_ = (d * mt + mt * d) * itemsize * (1 if nt == 1 else 2)
        io = (2 if bm < m else 1) * 2 * bm * d * itemsize
        need = (w_ + io + bm * d * (itemsize + 4)
                + bm * ct * (4 + itemsize) + (2 * d + 2 * mt + d) * itemsize)
        # +2MB slack over the default-path budget: forced configs slightly
        # past it measure fine (22.6MB est = the bs=8 winner); the wedge
        # line is ~27MB (see tune.sweep_mlpblock).
        return (bm, nt, ct) if need <= budget + 2 * 2**20 else None
    from vit_tpu.ops.pallas import tuning
    dtype = {2: jnp.bfloat16, 4: jnp.float32}.get(itemsize, jnp.float32)
    exact, wild = tuning.lookup_split("mlpblock", dtype, (m, d, mlp))

    def from_hit(hit):
        bm = int(hit["bm"]) or round_up(m, 8)  # bm=0 records "whole m"
        return bm, int(hit["nt"]), int(hit["ct"])

    if exact is not None:
        return from_hit(exact)

    def est(bm, nt, ct, nm):
        mt = mlp // nt
        w = (d * mt + mt * d) * itemsize * (1 if nt == 1 else 2)
        io = (2 if nm > 1 else 1) * 2 * bm * d * itemsize  # x + out
        scratch = bm * d * (itemsize + 4)          # xn + fp32 acc
        hidden = bm * ct * (4 + itemsize)          # fp32 pre-act + cast
        vecs = (2 * d + 2 * mt + d) * itemsize
        return w + io + scratch + hidden + vecs

    mp = round_up(m, 8)
    if mp <= 2048:
        for nt in (8, 4, 2):
            if mlp % (nt * 128):
                continue
            ct = min(mlp // nt, 512)
            if (mlp // nt) % ct == 0 and est(mp, nt, ct, 1) <= budget:
                return mp, nt, ct
    if wild is not None:
        return from_hit(wild)
    if mp > 2048:
        # Row-blocked weight streaming: grid (nm, nt>1) with bm ~ m/8.
        # Measured dominant on v5e bf16 (192-195 TF/s vs ~148 for the
        # resident-weight nt=1 plans at every B/16/B-32 shape >= m=3328);
        # each row block refetches weight tiles but the smaller tiles
        # pipeline DMA/MXU better and the hidden never exists in HBM.
        bms = [m // s for s in (8, 4, 13, 16)
               if m % s == 0 and 512 <= m // s <= 1024 and (m // s) % 8 == 0]
        for bm in bms + [512]:
            for nt in (4, 8, 2):
                if mlp % (nt * 128):
                    continue
                ct = min(mlp // nt, 512)
                if ((mlp // nt) % ct == 0
                        and est(bm, nt, ct, cdiv(m, bm)) <= budget):
                    return bm, nt, ct
    for nt in (1, 2, 4, 8):
        if mlp % (nt * 128):
            continue
        mt = mlp // nt
        for bm in (256, 128):
            for ct in (min(mt, 1024), min(mt, 512)):
                if mt % ct == 0 and est(bm, nt, ct, cdiv(m, bm)) <= budget:
                    return bm, nt, ct
    return None


def mlp_block(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
              w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
              *, eps: float = 1e-12, interpret: bool = False,
              partial_out: bool = False) -> jax.Array:
    """``x + fc2(gelu(fc1(LN(x))))`` in one Pallas pass (see module doc).

    ``x``: (..., D); ``w1``: (D, mlp); ``w2``: (mlp, D). Requires a plan
    from :func:`mlp_block_plan` (caller gates on it).

    ``partial_out=True``: tensor-parallel shard form — w1/w2 are this
    shard's mlp-column slice and the result is ``fc2_shard(gelu(
    fc1_shard(LN(x))))`` WITHOUT residual or b2 (see
    :mod:`vit_tpu.parallel.tp_pallas`); ``b2`` is ignored.
    """
    *lead, d = x.shape
    mlp = w1.shape[1]
    assert w1.shape == (d, mlp) and w2.shape == (mlp, d), (w1.shape, w2.shape)
    xf = x.reshape(-1, d)
    m = xf.shape[0]
    plan = mlp_block_plan(m, d, mlp, x.dtype.itemsize)
    assert plan is not None, (m, d, mlp, x.dtype)
    bm, nt, ct = plan
    mt = mlp // nt
    nc = mt // ct

    kernel = functools.partial(_mlp_kernel, eps=eps, d=d, nt=nt, nc=nc,
                               ct=ct, precision=_dot_precision(x.dtype),
                               partial=partial_out)
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(m, bm), nt),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),          # x
            pl.BlockSpec((1, d), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),          # ln scale
            pl.BlockSpec((1, d), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),          # ln bias
            pl.BlockSpec((d, mt), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),          # w1
            pl.BlockSpec((1, mt), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),          # b1
            pl.BlockSpec((mt, d), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),          # w2
            pl.BlockSpec((1, d), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),          # b2
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, d), x.dtype),      # xn cache
            pltpu.VMEM((bm, d), jnp.float32),  # residual-seeded accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # Mosaic's default scoped-VMEM limit is 16MB; the chip has ~32+
            # (probed — see _VMEM_BUDGET). Resident-weight plans need more.
            vmem_limit_bytes=28 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * mlp,
            bytes_accessed=(2 * m * d + 2 * d * mlp) * x.dtype.itemsize,
            transcendentals=m * mlp),
        interpret=interpret,
    )(xf, ln_scale.reshape(1, d), ln_bias.reshape(1, d),
      w1, b1.reshape(1, mlp), w2, b2.reshape(1, d))
    return out.reshape(*lead, d)


def mlp_block_stacked(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                      w1: jax.Array, b1: jax.Array, w2: jax.Array,
                      b2: jax.Array, idx: jax.Array, *, eps: float = 1e-12,
                      interpret: bool = False) -> jax.Array:
    """:func:`mlp_block` reading layer ``idx``'s weights DIRECTLY from the
    scan-stacked (L, ...) parameter arrays via scalar-prefetch index maps.

    Under ``lax.scan`` the per-layer variant receives dynamic slices of
    the stacked params; ``pallas_call`` is opaque to XLA, so every slice
    materializes as an HBM->HBM copy first — measured 16-30 us/layer on
    L/16 bf16 (tools/scan_overhead_probe.py), a pure tax on every
    scan-path forward. Here the stacked arrays are passed whole, the
    layer index rides the scalar-prefetch channel, and the index maps
    select layer ``idx``'s blocks, so each weight byte moves HBM->VMEM
    exactly once. Same plan, same kernel body (squeezed leading dim).

    ``ln_scale``/``ln_bias``: (L, D); ``w1``: (L, D, mlp); ``b1``:
    (L, mlp); ``w2``: (L, mlp, D); ``b2``: (L, D); ``idx``: int32 scalar.
    """
    *lead, d = x.shape
    mlp = w1.shape[2]
    xf = x.reshape(-1, d)
    m = xf.shape[0]
    plan = mlp_block_plan(m, d, mlp, x.dtype.itemsize)
    assert plan is not None, (m, d, mlp, x.dtype)
    bm, nt, ct = plan
    mt = mlp // nt
    nc = mt // ct

    kernel = functools.partial(_mlp_kernel, eps=eps, d=d, nt=nt, nc=nc,
                               ct=ct, precision=_dot_precision(x.dtype))
    vec = lambda n, im: pl.BlockSpec((None, 1, n), im,
                                     memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cdiv(m, bm), nt),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, t, s: (i, 0),
                         memory_space=pltpu.VMEM),                  # x
            vec(d, lambda i, t, s: (s[0], 0, 0)),                   # ln scale
            vec(d, lambda i, t, s: (s[0], 0, 0)),                   # ln bias
            pl.BlockSpec((None, d, mt), lambda i, t, s: (s[0], 0, t),
                         memory_space=pltpu.VMEM),                  # w1
            vec(mt, lambda i, t, s: (s[0], 0, t)),                  # b1
            pl.BlockSpec((None, mt, d), lambda i, t, s: (s[0], t, 0),
                         memory_space=pltpu.VMEM),                  # w2
            vec(d, lambda i, t, s: (s[0], 0, 0)),                   # b2
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, t, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bm, d), x.dtype),      # xn cache
            pltpu.VMEM((bm, d), jnp.float32),  # residual-seeded accumulator
        ],
    )
    l = w1.shape[0]
    out = pl.pallas_call(
        lambda s_ref, *args: kernel(*args),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=28 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * mlp,
            bytes_accessed=(2 * m * d + 2 * d * mlp) * x.dtype.itemsize,
            transcendentals=m * mlp),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), xf,
      ln_scale.reshape(l, 1, d), ln_bias.reshape(l, 1, d),
      w1, b1.reshape(l, 1, mlp), w2, b2.reshape(l, 1, d))
    return out.reshape(*lead, d)


# ------------------------------------------- int8 mlp block (weight-only) --

def _mlp_q_kernel(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                  s2_ref, b2_ref, o_ref, xn_ref, acc_ref, *, eps: float,
                  d: int, nt: int, nc: int, ct: int, precision,
                  partial: bool = False):
    """:func:`_mlp_kernel` with int8 weight tiles (vit_tpu/quant.py layout).

    Weight-only quantization: the streamed fc1/fc2 tiles arrive as int8 —
    half (bf16) / a quarter (fp32) of the HBM weight traffic that bounds
    the small-batch latency regime (docs/PERF.md §3) — and are cast to the
    compute dtype on-core (int8 -> bf16 is exact for |q| <= 127); the
    per-output-channel fp32 scales are applied after each dot, so the
    math is identical to dequantized-weight matmuls. Activations stay in
    the float compute dtype (the XLA tier's dynamic activation int8 trades
    more accuracy for MXU rate; this kernel targets the DMA-bound regime
    where compute is not the bottleneck).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        x32 = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
        xn = (xn * g_ref[:].astype(jnp.float32)
              + b_ref[:].astype(jnp.float32))
        xn_ref[:] = xn.astype(xn_ref.dtype)
        # Zero seed on the TP partial path: residual and b2 are added
        # exactly once by the caller, after the cross-shard psum.
        acc_ref[:] = (jnp.zeros_like(x32) if partial
                      else x32 + b2_ref[:].astype(jnp.float32))

    xn = xn_ref[:]
    for c in range(nc):
        sl = slice(c * ct, (c + 1) * ct)
        h = jax.lax.dot_general(
            xn, w1_ref[:, sl].astype(xn.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        h = h * s1_ref[:, sl]
        h = gelu(h + b1_ref[:, sl].astype(jnp.float32)).astype(xn.dtype)
        y = jax.lax.dot_general(
            h, w2_ref[sl, :].astype(xn.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        acc_ref[:] += y * s2_ref[:]

    @pl.when(t == nt - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def mlp_block_q(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                w1q: jax.Array, s1: jax.Array, b1: jax.Array,
                w2q: jax.Array, s2: jax.Array, b2: jax.Array,
                *, eps: float = 1e-12, interpret: bool = False,
                partial_out: bool = False) -> jax.Array:
    """Int8-weight ``x + fc2(gelu(fc1(LN(x))))`` in one Pallas pass.

    ``w1q`` (D, mlp) / ``w2q`` (mlp, D) int8 with fp32 per-output-channel
    scales ``s1`` (mlp,) / ``s2`` (D,) from
    :func:`vit_tpu.quant.quantize_weight`. Plan-gated like
    :func:`mlp_block` (the float plan over-estimates the int8 weight
    VMEM, so any plan it returns is safe here).

    ``partial_out=True``: tensor-parallel shard form — w1q/w2q hold this
    shard's mlp-column slice, no residual / b2 (added post-psum).
    """
    *lead, d = x.shape
    mlp = w1q.shape[1]
    assert w1q.dtype == jnp.int8 and w2q.dtype == jnp.int8
    assert w1q.shape == (d, mlp) and w2q.shape == (mlp, d)
    xf = x.reshape(-1, d)
    m = xf.shape[0]
    plan = mlp_block_plan_i8(m, d, mlp, x.dtype.itemsize)
    assert plan is not None, (m, d, mlp, x.dtype)
    bm, nt, ct = plan
    mt = mlp // nt
    nc = mt // ct

    kernel = functools.partial(_mlp_q_kernel, eps=eps, d=d, nt=nt, nc=nc,
                               ct=ct, precision=_dot_precision(x.dtype),
                               partial=partial_out)
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(m, bm), nt),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),          # x
            pl.BlockSpec((1, d), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),          # ln scale
            pl.BlockSpec((1, d), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),          # ln bias
            pl.BlockSpec((d, mt), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),          # w1 int8
            pl.BlockSpec((1, mt), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),          # s1
            pl.BlockSpec((1, mt), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),          # b1
            pl.BlockSpec((mt, d), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),          # w2 int8
            pl.BlockSpec((1, d), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),          # s2
            pl.BlockSpec((1, d), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),          # b2
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, d), x.dtype),      # xn cache
            pltpu.VMEM((bm, d), jnp.float32),  # residual-seeded accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=28 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * mlp,
            bytes_accessed=2 * m * d * x.dtype.itemsize + 2 * d * mlp,
            transcendentals=m * mlp),
        interpret=interpret,
    )(xf, ln_scale.reshape(1, d), ln_bias.reshape(1, d),
      w1q, s1.reshape(1, mlp), b1.reshape(1, mlp),
      w2q, s2.reshape(1, d), b2.reshape(1, d))
    return out.reshape(*lead, d)


def mlp_block_plan_i8(m: int, d: int, mlp: int, itemsize: int,
                      budget: int = _VMEM_BUDGET):
    """Plan for the int8 MLP kernels: env force (via the shared plan) >
    int8-tuned entry (op ``mlpblocki8``) > the shared float plan.

    The bf16 winner is a good prior (same grid, same streaming scheme),
    but the int8 kernels add per-row activation-quantize VPU work and
    halve the weight DMA, which can shift the best row blocking — shapes
    where it matters get their own tuned entries
    (``python -m vit_tpu.bench.tune --op quant``; the entry is timed on
    :func:`mlp_block_i8dot` and shared with the weight-only
    :func:`mlp_block_q` and the stacked variants, whose VPU/DMA balance
    differs slightly — acceptable because grid/VMEM feasibility is
    identical and the measured spread between them is within noise).

    A tuned hit is re-validated against ``budget`` with the int8 weight
    footprint before it is returned, so a caller passing a tighter budget
    than the tuner's is never handed an infeasible plan.
    """
    if os.environ.get("VIT_TPU_MLP_PLAN"):
        return mlp_block_plan(m, d, mlp, itemsize, budget)

    def est_i8(bm, nt, ct, nm):
        # _mlp_q_kernel/_mlp_i8dot_kernel footprint: int8 weights (1 B)
        # + scale rows, float x/out IO, xn + fp32 acc scratch, fp32
        # hidden + cast, int8 xq/cq rows (i8dot only — counted always,
        # conservatively).
        mt = mlp // nt
        w = (d * mt + mt * d) * (1 if nt == 1 else 2) + 4 * (mt + d)
        io = (2 if nm > 1 else 1) * 2 * bm * d * itemsize
        scratch = bm * d * (itemsize + 4) + bm * d      # xn + acc + xq
        hidden = bm * ct * (4 + itemsize) + bm * ct     # fp32 + cast + cq
        vecs = (2 * d + 2 * mt + d) * itemsize
        return w + io + scratch + hidden + vecs

    from vit_tpu.ops.pallas import tuning
    dtype = {2: jnp.bfloat16, 4: jnp.float32}.get(itemsize, jnp.float32)
    hit = tuning.lookup("mlpblocki8", dtype, (m, d, mlp))
    if hit is not None:
        bm = int(hit["bm"]) or round_up(m, 8)
        nt, ct = int(hit["nt"]), int(hit["ct"])
        if est_i8(bm, nt, ct, cdiv(m, bm)) <= budget:
            return bm, nt, ct
        # Tuned under a roomier budget than this caller's: fall through
        # to the float planner, which gates every candidate on `budget`
        # (with the larger float footprint — conservative, always safe).
    return mlp_block_plan(m, d, mlp, itemsize, budget)


# ----------------------------------- int8-dot mlp block (act+weight quant) --

def _mlp_i8dot_kernel(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                      s2_ref, b2_ref, o_ref, xq_ref, ax_ref, acc_ref, *,
                      eps: float, d: int, nt: int, nc: int, ct: int,
                      partial: bool = False):
    """:func:`_mlp_q_kernel` with the dots ALSO in int8: activations are
    dynamically quantized per row (symmetric, max-abs/127) and every matmul
    runs s8 x s8 -> s32 — the MXU's double-rate int8 path (~2x bf16 on
    v5e spec). For the compute-bound throughput regime; the weight-only
    kernel (:func:`_mlp_q_kernel`) keeps the accuracy edge for the
    DMA-bound small-batch regime. Gated opt-in until the on-chip probe
    (tools/int8_probe.py) confirms Mosaic lowers int8 dot_generals.
    """
    t = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        x32 = x_ref[:].astype(f32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * g_ref[:].astype(f32) + b_ref[:].astype(f32)
        ax = jnp.maximum(jnp.max(jnp.abs(xn), axis=-1, keepdims=True),
                         1e-12) / 127.0
        ax_ref[:] = ax
        xq_ref[:] = jnp.round(xn / ax).astype(jnp.int8)
        # Zero seed on the TP partial path (residual + b2 added post-psum).
        acc_ref[:] = (jnp.zeros_like(x32) if partial
                      else x32 + b2_ref[:].astype(f32))

    xq = xq_ref[:]
    ax = ax_ref[:]
    for c in range(nc):
        sl = slice(c * ct, (c + 1) * ct)
        acc1 = jax.lax.dot_general(
            xq, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        h = acc1.astype(f32) * ax * s1_ref[:, sl]
        h = gelu(h + b1_ref[:, sl].astype(f32))
        ah = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                         1e-12) / 127.0
        hq = jnp.round(h / ah).astype(jnp.int8)
        acc2 = jax.lax.dot_general(
            hq, w2_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[:] += acc2.astype(f32) * ah * s2_ref[:]

    @pl.when(t == nt - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def mlp_block_i8dot(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                    w1q: jax.Array, s1: jax.Array, b1: jax.Array,
                    w2q: jax.Array, s2: jax.Array, b2: jax.Array,
                    *, eps: float = 1e-12, interpret: bool = False,
                    partial_out: bool = False) -> jax.Array:
    """Int8-DOT ``x + fc2(gelu(fc1(LN(x))))``: weights AND activations int8,
    every matmul s8 x s8 -> s32 on the MXU's double-rate path.

    Same weight layout as :func:`mlp_block_q`. Numerics match the XLA
    tier's :func:`vit_tpu.quant.int8_matmul` (dynamic per-row activation
    quant), not the float model. Plan-gated like :func:`mlp_block`.

    ``partial_out=True``: tensor-parallel shard form (see
    :func:`mlp_block_q`).
    """
    *lead, d = x.shape
    mlp = w1q.shape[1]
    assert w1q.dtype == jnp.int8 and w2q.dtype == jnp.int8
    xf = x.reshape(-1, d)
    m = xf.shape[0]
    plan = mlp_block_plan_i8(m, d, mlp, x.dtype.itemsize)
    assert plan is not None, (m, d, mlp, x.dtype)
    bm, nt, ct = plan
    mt = mlp // nt
    nc = mt // ct

    kernel = functools.partial(_mlp_i8dot_kernel, eps=eps, d=d, nt=nt,
                               nc=nc, ct=ct, partial=partial_out)
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(m, bm), nt),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),          # x
            pl.BlockSpec((1, d), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),          # ln scale
            pl.BlockSpec((1, d), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),          # ln bias
            pl.BlockSpec((d, mt), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),          # w1 int8
            pl.BlockSpec((1, mt), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),          # s1
            pl.BlockSpec((1, mt), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),          # b1
            pl.BlockSpec((mt, d), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),          # w2 int8
            pl.BlockSpec((1, d), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),          # s2
            pl.BlockSpec((1, d), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),          # b2
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, d), jnp.int8),     # quantized xn
            pltpu.VMEM((bm, 1), jnp.float32),  # per-row activation scales
            pltpu.VMEM((bm, d), jnp.float32),  # residual-seeded accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=28 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * mlp,
            bytes_accessed=2 * m * d * x.dtype.itemsize + 2 * d * mlp,
            transcendentals=m * mlp),
        interpret=interpret,
    )(xf, ln_scale.reshape(1, d), ln_bias.reshape(1, d),
      w1q, s1.reshape(1, mlp), b1.reshape(1, mlp),
      w2q, s2.reshape(1, d), b2.reshape(1, d))
    return out.reshape(*lead, d)


# -------------------------------------------------------- attention block --

def _ln32(x32, g_ref, b_ref, eps):
    """Fused LN on an fp32 row block (stats in fp32, eps inside the sqrt —
    reference vit/kernels/layernorm.py:72-73)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return xn * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)


def _attn_core(x32, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, *,
               eps, d, sp, num_heads, head_dim, scale, seq_len, precision,
               cdtype, dl=None, partial=False):
    """fp32 ``x32 + proj(MHA(LN(x32)))`` for one (sp, D) batch segment —
    the shared body of :func:`_attn_kernel` and :func:`_layer_kernel`.
    ``cdtype`` is the compute/storage dtype for the bf16-able temps.

    ``dl``/``partial`` select the tensor-parallel shard form
    (:func:`attn_block_partial`): wqkv_ref is (d, 3*dl) holding this
    shard's ``num_heads`` (LOCAL count) head columns, wout_ref is (dl, d),
    and the result is the shard's output-projection PARTIAL SUM — no
    residual, no output bias (both added once post-psum; bout_ref unused).
    """
    if dl is None:
        dl = d
    xn = _ln32(x32, g_ref, b_ref, eps).astype(cdtype)

    # QKV one projection at a time: caps the fp32 temp at (sp, dl).
    proj = []
    for p_i in range(3):
        cols = slice(p_i * dl, (p_i + 1) * dl)
        z = jax.lax.dot_general(
            xn, wqkv_ref[:, cols], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        z = z + bqkv_ref[:, cols].astype(jnp.float32)
        proj.append(z.astype(cdtype))
    q_all, k_all, v_all = proj

    parts = []
    for h in range(num_heads):
        hs = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q_all[:, hs], k_all[:, hs], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) * scale
        if seq_len != sp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < seq_len, s, float("-inf"))
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(cdtype), v_all[:, hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        parts.append(ctx / l)
    ctx_all = jnp.concatenate(parts, axis=1).astype(cdtype)

    out = jax.lax.dot_general(
        ctx_all, wout_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    if partial:
        return out
    return out + bout_ref[:].astype(jnp.float32) + x32


def _attn_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                 bout_ref, o_ref, *, eps: float, d: int, sp: int,
                 num_heads: int, head_dim: int, scale: float, seq_len: int,
                 group: int, precision):
    """``group`` batches of (sp, D) rows through LN -> QKV -> MHA -> proj
    -> +x, entirely in VMEM. Heads are column slices of the packed
    (sp, D) projections — no head transposes anywhere."""
    for g in range(group):
        rows = slice(g * sp, (g + 1) * sp)
        out = _attn_core(
            x_ref[rows, :].astype(jnp.float32), g_ref, b_ref, wqkv_ref,
            bqkv_ref, wout_ref, bout_ref, eps=eps, d=d, sp=sp,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            seq_len=seq_len, precision=precision, cdtype=x_ref.dtype)
        o_ref[rows, :] = out.astype(o_ref.dtype)


def _attn_wstream_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                         bout_ref, o_ref, xn_ref, qkv_ref, *, eps: float,
                         d: int, sp: int, num_heads: int, head_dim: int,
                         scale: float, seq_len: int, b: int, precision):
    """Weight-streaming layout: grid (4,) over [q-proj, k-proj, v-proj,
    attention+out-proj]; the whole (B*sp, D) activation, its LN image and
    the packed QKV stay VMEM-resident while the (D, D) wqkv column tiles
    stream through the grid — so at small batch the weight DMA pipelines
    with compute instead of stalling a single grid step."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        x32 = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
        xn = (xn * g_ref[:].astype(jnp.float32)
              + b_ref[:].astype(jnp.float32))
        xn_ref[:] = xn.astype(xn_ref.dtype)

    @pl.when(t < 3)
    def _():
        # One projection per grid step; row-chunked so the fp32 temp stays
        # (sp, d). wqkv_ref/bqkv_ref hold this step's column tile.
        for g in range(b):
            rows = slice(g * sp, (g + 1) * sp)
            z = jax.lax.dot_general(
                xn_ref[rows, :], wqkv_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            z = (z + bqkv_ref[:].astype(jnp.float32)).astype(qkv_ref.dtype)
            for p in range(3):
                @pl.when(t == p)
                def _(z=z, p=p, rows=rows):
                    qkv_ref[p, rows, :] = z

    @pl.when(t == 3)
    def _():
        for g in range(b):
            rows = slice(g * sp, (g + 1) * sp)
            q_all = qkv_ref[0, rows, :]
            k_all = qkv_ref[1, rows, :]
            v_all = qkv_ref[2, rows, :]
            parts = []
            for h in range(num_heads):
                hs = slice(h * head_dim, (h + 1) * head_dim)
                s = jax.lax.dot_general(
                    q_all[:, hs], k_all[:, hs], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision) * scale
                if seq_len != sp:
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(col < seq_len, s, float("-inf"))
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                l = jnp.sum(p, axis=-1, keepdims=True)
                ctx = jax.lax.dot_general(
                    p.astype(x_ref.dtype), v_all[:, hs],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                parts.append(ctx / l)
            ctx_all = jnp.concatenate(parts, axis=1).astype(x_ref.dtype)
            out = jax.lax.dot_general(
                ctx_all, wout_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            out = (out + bout_ref[:].astype(jnp.float32)
                   + x_ref[rows, :].astype(jnp.float32))
            o_ref[rows, :] = out.astype(o_ref.dtype)


def attn_block_plan(b: int, sp: int, d: int, num_heads: int, itemsize: int,
                    budget: int = _VMEM_BUDGET):
    """Plan dict for :func:`attn_block`, or None.

    ``{"layout": "wstream"}`` — whole-batch-resident weight streaming
    (:func:`_attn_wstream_kernel`), the small-batch latency regime; or
    ``{"layout": "mstream", "group": g}`` — ``g`` batches per grid step
    with all weights resident (:func:`_attn_kernel`), the throughput
    regime. Tuned entries (op ``attnblock``, dims (b, sp, d, heads), b=0
    wildcard) force either layout.
    """
    if d % 128 or sp % 8 or d % num_heads:
        return None
    env = os.environ.get("VIT_TPU_ATTN_PLAN")
    if env:  # "wstream" or "mstream,<group>" — tune.py's config forcing
        if env == "wstream":
            return {"layout": "wstream"}
        return {"layout": "mstream", "group": int(env.split(",")[1])}
    from vit_tpu.ops.pallas import tuning
    dtype = {2: jnp.bfloat16, 4: jnp.float32}.get(itemsize, jnp.float32)
    exact, wild = tuning.lookup_split("attnblock", dtype,
                                      (b, sp, d, num_heads))

    m = b * sp
    wstream_vmem = (
        2 * 2 * d * d * itemsize                   # wqkv tile, double-buffered
        + d * d * itemsize                         # wout
        + 2 * m * d * itemsize                     # x + out (single-buffered)
        + m * d * itemsize                         # xn scratch
        + 3 * m * d * itemsize                     # packed qkv scratch
        + sp * d * 4 * 2                           # fp32 proj/out row temps
        + sp * sp * 4 * 2                          # scores + probs fp32
        + sp * d * 4)                              # ctx fp32
    wstream_ok = wstream_vmem <= budget and b <= 8

    def mstream(group, slack=0):
        group = min(int(group), b)
        while b % group:
            group -= 1
        w = (d * 3 * d + d * d) * itemsize                # resident weights
        per_batch = (2 * 2 * sp * d * itemsize            # x + out dbuf
                     + sp * d * (4 + 3 * itemsize)        # fp32 qkv + q/k/v
                     + sp * sp * 4 * 2                    # scores+probs fp32
                     + sp * d * 4)                        # ctx fp32
        if w + group * per_batch > budget + slack:
            return {"layout": "wstream"} if wstream_ok else None
        return {"layout": "mstream", "group": group}

    for hit in (exact,):
        if hit is None:
            continue
        if hit.get("layout") == "wstream":
            return ({"layout": "wstream"} if wstream_ok
                    else mstream(hit.get("group", 1)))
        # +2MB slack for EXACT tuned hits, matching mlp_block_plan: the
        # sweep measured this very config running on this hardware (e.g.
        # L/16-384's (8,592,1024) mstream,1 estimates 23.4MB and runs
        # fine), so the conservative estimate alone must not veto it.
        return mstream(hit.get("group", 1), slack=2 * 2**20)
    if wstream_ok:
        return {"layout": "wstream"}
    if wild is not None and "group" in wild:
        return mstream(wild["group"])
    return mstream(1)


def attn_block(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
               wqkv: jax.Array, bqkv: jax.Array, wout: jax.Array,
               bout: jax.Array, *, num_heads: int,
               scale: float | None = None, seq_len: int | None = None,
               eps: float = 1e-12, interpret: bool = False) -> jax.Array:
    """``x + proj(MHA(LN(x)))`` in one Pallas pass (see module doc).

    ``x``: (B, S, D) with S already sublane-aligned when padded (the model
    pads the whole encoder — vit_tpu/models/vit.py); ``seq_len`` is the
    real token count (keys past it are masked, query rows past it produce
    garbage the caller slices off). ``wqkv``: (D, 3D) packed [q|k|v].
    """
    b, sp, d = x.shape
    hd = d // num_heads
    assert wqkv.shape == (d, 3 * d) and wout.shape == (d, d)
    if scale is None:
        scale = hd ** -0.5
    if seq_len is None:
        seq_len = sp
    plan = attn_block_plan(b, sp, d, num_heads, x.dtype.itemsize)
    assert plan is not None, (b, sp, d, num_heads, x.dtype)
    xf = x.reshape(b * sp, d)
    if plan["layout"] == "wstream":
        return _attn_block_wstream(
            xf, ln_scale, ln_bias, wqkv, bqkv, wout, bout, b=b, sp=sp, d=d,
            num_heads=num_heads, head_dim=hd, scale=scale, seq_len=seq_len,
            eps=eps, interpret=interpret).reshape(b, sp, d)
    group = plan["group"]

    kernel = functools.partial(
        _attn_kernel, eps=eps, d=d, sp=sp, num_heads=num_heads,
        head_dim=hd, scale=scale, seq_len=seq_len, group=group,
        precision=_dot_precision(x.dtype))
    blk = pl.BlockSpec((group * sp, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            blk,                                            # x
            vec(d), vec(d),                                 # ln scale/bias
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # wqkv
            vec(3 * d),                                     # bqkv
            pl.BlockSpec((d, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # wout
            vec(d),                                         # bout
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b * sp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # 40MB, not the suite-wide 28: under the model's lax.scan the
            # stacked-weight blocks add scoped vmem on top of the kernel's
            # own allocation, and the demand grows with batch at the
            # L/16-384 geometry (round 3 measured b=64 mstream,1 at
            # 28.66MB in-scan; after the round-4 body refactor the same
            # sweep compiles to 32.04MB at b=8 and 36.66MB at b=64). A
            # too-small limit is a clean compile OOM, not the
            # compile-service wedge class, and v5e VMEM is 128MB — 40
            # keeps real margin at every measured geometry.
            vmem_limit_bytes=40 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sp * d * 4 * d + 4 * b * sp * sp * d,
            bytes_accessed=(2 * b * sp * d + 4 * d * d) * x.dtype.itemsize,
            transcendentals=b * sp * sp),
        interpret=interpret,
    )(xf, ln_scale.reshape(1, d), ln_bias.reshape(1, d), wqkv,
      bqkv.reshape(1, 3 * d), wout, bout.reshape(1, d))
    return out.reshape(b, sp, d)


def _attn_block_wstream(xf, ln_scale, ln_bias, wqkv, bqkv, wout, bout, *,
                        b, sp, d, num_heads, head_dim, scale, seq_len, eps,
                        interpret):
    """pallas_call wrapper for :func:`_attn_wstream_kernel`: grid (4,)
    streams the three (D, D) wqkv column tiles then runs attention."""
    m = b * sp
    kernel = functools.partial(
        _attn_wstream_kernel, eps=eps, d=d, sp=sp, num_heads=num_heads,
        head_dim=head_dim, scale=scale, seq_len=seq_len, b=b,
        precision=_dot_precision(xf.dtype))
    full = pl.BlockSpec((m, d), lambda t: (0, 0), memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda t: (0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[
            full,                                           # x
            vec(d), vec(d),                                 # ln scale/bias
            pl.BlockSpec((d, d), lambda t: (0, jnp.minimum(t, 2)),
                         memory_space=pltpu.VMEM),          # wqkv col tile
            pl.BlockSpec((1, d), lambda t: (0, jnp.minimum(t, 2)),
                         memory_space=pltpu.VMEM),          # bqkv tile
            pl.BlockSpec((d, d), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),          # wout
            vec(d),                                         # bout
        ],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((m, d), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((m, d), xf.dtype),      # xn cache
            pltpu.VMEM((3, m, d), xf.dtype),   # packed q/k/v
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=28 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * 4 * d + 4 * m * sp * d,
            bytes_accessed=(2 * m * d + 4 * d * d) * xf.dtype.itemsize,
            transcendentals=m * sp),
        interpret=interpret,
    )(xf, ln_scale.reshape(1, d), ln_bias.reshape(1, d), wqkv,
      bqkv.reshape(1, 3 * d), wout, bout.reshape(1, d))


# ------------------------------------- tensor-parallel attention partial --

def _attn_partial_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                         o_ref, *, eps: float, d: int, dl: int, sp: int,
                         num_heads: int, head_dim: int, scale: float,
                         seq_len: int, group: int, precision):
    """Tensor-parallel shard form of :func:`_attn_kernel`: this shard's
    ``num_heads`` (LOCAL) heads through LN -> QKV_shard -> MHA ->
    proj_shard, emitting the output-projection PARTIAL SUM (no residual,
    no output bias — the caller adds both once after the cross-shard
    ``lax.psum``; see :mod:`vit_tpu.parallel.tp_pallas`)."""
    for g in range(group):
        rows = slice(g * sp, (g + 1) * sp)
        out = _attn_core(
            x_ref[rows, :].astype(jnp.float32), g_ref, b_ref, wqkv_ref,
            bqkv_ref, wout_ref, None, eps=eps, d=d, dl=dl, sp=sp,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            seq_len=seq_len, precision=precision, cdtype=x_ref.dtype,
            partial=True)
        o_ref[rows, :] = out.astype(o_ref.dtype)


def attn_block_partial_plan(b: int, sp: int, d: int, dl: int, itemsize: int,
                            budget: int = _VMEM_BUDGET):
    """``{"group": g}`` plan for :func:`attn_block_partial`, or None.

    All weights stay resident (they are 1/shards of the full layer's, so
    any geometry whose full-weight mstream plan fits trivially fits here);
    ``dl`` must be lane-aligned so the per-head column slices tile."""
    if d % 128 or dl % 128 or sp % 8:
        return None
    w = (d * 3 * dl + dl * d) * itemsize
    per_batch = (2 * 2 * sp * d * itemsize          # x + out dbuf
                 + sp * dl * (4 + 3 * itemsize)     # fp32 z + q/k/v
                 + sp * sp * 4 * 2                  # scores + probs fp32
                 + sp * dl * 4)                     # ctx fp32
    if w + per_batch > budget:
        return None
    group = b
    while b % group or w + group * per_batch > budget:
        group -= 1
    return {"group": group}


def attn_block_partial(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                       wqkv: jax.Array, bqkv: jax.Array, wout: jax.Array, *,
                       num_heads: int, scale: float | None = None,
                       seq_len: int | None = None, eps: float = 1e-12,
                       interpret: bool = False) -> jax.Array:
    """``proj_shard(MHA_shard(LN(x)))`` — one TP shard's attention half.

    ``x``: (B, S, D) replicated over the 'model' axis; ``wqkv``:
    (D, 3*dl) packed ``[q_s|k_s|v_s]`` where ``dl = num_heads * head_dim``
    counts only this shard's heads (head-major repacking is done by
    :func:`vit_tpu.parallel.tp_pallas.shard_encoder_tp`); ``wout``:
    (dl, D). Returns the partial sum to ``lax.psum`` over 'model'; the
    residual and output bias are NOT included (add once post-psum).
    """
    b, sp, d = x.shape
    dl = wqkv.shape[1] // 3
    hd = dl // num_heads
    assert wqkv.shape == (d, 3 * dl) and wout.shape == (dl, d), (
        wqkv.shape, wout.shape)
    if scale is None:
        scale = hd ** -0.5
    if seq_len is None:
        seq_len = sp
    plan = attn_block_partial_plan(b, sp, d, dl, x.dtype.itemsize)
    assert plan is not None, (b, sp, d, dl, x.dtype)
    group = plan["group"]
    xf = x.reshape(b * sp, d)

    kernel = functools.partial(
        _attn_partial_kernel, eps=eps, d=d, dl=dl, sp=sp,
        num_heads=num_heads, head_dim=hd, scale=scale, seq_len=seq_len,
        group=group, precision=_dot_precision(x.dtype))
    blk = pl.BlockSpec((group * sp, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            blk,                                            # x
            vec(d), vec(d),                                 # ln scale/bias
            pl.BlockSpec((d, 3 * dl), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # wqkv shard
            vec(3 * dl),                                    # bqkv shard
            pl.BlockSpec((dl, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # wout shard
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b * sp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=29 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sp * d * 4 * dl + 4 * b * sp * sp * dl,
            bytes_accessed=(2 * b * sp * d + 4 * d * dl) * x.dtype.itemsize,
            transcendentals=b * sp * sp),
        interpret=interpret,
    )(xf, ln_scale.reshape(1, d), ln_bias.reshape(1, d), wqkv,
      bqkv.reshape(1, 3 * dl), wout)
    return out.reshape(b, sp, d)


# -------------------------------------------- scan-stacked attention block --

def attn_block_stacked(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                       wqkv: jax.Array, bqkv: jax.Array, wout: jax.Array,
                       bout: jax.Array, idx: jax.Array, *, num_heads: int,
                       scale: float | None = None, seq_len: int | None = None,
                       eps: float = 1e-12, interpret: bool = False
                       ) -> jax.Array:
    """:func:`attn_block` reading layer ``idx``'s weights DIRECTLY from the
    scan-stacked (L, ...) arrays via scalar-prefetch index maps — the
    attention counterpart of :func:`mlp_block_stacked` (see its docstring
    for why: kills the per-layer dynamic-slice HBM copies under scan).

    ``ln_scale``/``ln_bias``/``bout``: (L, D); ``wqkv``: (L, D, 3D);
    ``bqkv``: (L, 3D); ``wout``: (L, D, D); ``idx``: int32 scalar. Same
    plans (and tuned entries) as the per-layer form.
    """
    b, sp, d = x.shape
    hd = d // num_heads
    l = wqkv.shape[0]
    assert wqkv.shape == (l, d, 3 * d) and wout.shape == (l, d, d)
    if scale is None:
        scale = hd ** -0.5
    if seq_len is None:
        seq_len = sp
    plan = attn_block_plan(b, sp, d, num_heads, x.dtype.itemsize)
    assert plan is not None, (b, sp, d, num_heads, x.dtype)
    xf = x.reshape(b * sp, d)
    idx = jnp.asarray(idx, jnp.int32).reshape(1)
    args = (xf, ln_scale.reshape(l, 1, d), ln_bias.reshape(l, 1, d),
            wqkv, bqkv.reshape(l, 1, 3 * d), wout, bout.reshape(l, 1, d))
    vec = lambda n, im: pl.BlockSpec((None, 1, n), im,
                                     memory_space=pltpu.VMEM)
    mat = lambda shape, im: pl.BlockSpec((None, *shape), im,
                                         memory_space=pltpu.VMEM)

    if plan["layout"] == "wstream":
        m = b * sp
        kernel = functools.partial(
            _attn_wstream_kernel, eps=eps, d=d, sp=sp, num_heads=num_heads,
            head_dim=hd, scale=scale, seq_len=seq_len, b=b,
            precision=_dot_precision(x.dtype))
        full = pl.BlockSpec((m, d), lambda t, s: (0, 0),
                            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(4,),
            in_specs=[
                full,                                               # x
                vec(d, lambda t, s: (s[0], 0, 0)),                  # ln scale
                vec(d, lambda t, s: (s[0], 0, 0)),                  # ln bias
                mat((d, d), lambda t, s: (s[0], 0, jnp.minimum(t, 2))),
                vec(d, lambda t, s: (s[0], 0, jnp.minimum(t, 2))),  # bqkv tile
                mat((d, d), lambda t, s: (s[0], 0, 0)),             # wout
                vec(d, lambda t, s: (s[0], 0, 0)),                  # bout
            ],
            out_specs=full,
            scratch_shapes=[
                pltpu.VMEM((m, d), x.dtype),      # xn cache
                pltpu.VMEM((3, m, d), x.dtype),   # packed q/k/v
            ],
        )
        out = pl.pallas_call(
            lambda s_ref, *a: kernel(*a),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=28 * 2**20),
            cost_estimate=pl.CostEstimate(
                flops=2 * m * d * 4 * d + 4 * m * sp * d,
                bytes_accessed=(2 * m * d + 4 * d * d) * x.dtype.itemsize,
                transcendentals=m * sp),
            interpret=interpret,
        )(idx, *args)
        return out.reshape(b, sp, d)

    group = plan["group"]
    kernel = functools.partial(
        _attn_kernel, eps=eps, d=d, sp=sp, num_heads=num_heads,
        head_dim=hd, scale=scale, seq_len=seq_len, group=group,
        precision=_dot_precision(x.dtype))
    blk = pl.BlockSpec((group * sp, d), lambda i, s: (i, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // group,),
        in_specs=[
            blk,                                                # x
            vec(d, lambda i, s: (s[0], 0, 0)),                  # ln scale
            vec(d, lambda i, s: (s[0], 0, 0)),                  # ln bias
            mat((d, 3 * d), lambda i, s: (s[0], 0, 0)),         # wqkv
            vec(3 * d, lambda i, s: (s[0], 0, 0)),              # bqkv
            mat((d, d), lambda i, s: (s[0], 0, 0)),             # wout
            vec(d, lambda i, s: (s[0], 0, 0)),                  # bout
        ],
        out_specs=blk,
    )
    out = pl.pallas_call(
        lambda s_ref, *a: kernel(*a),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * sp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # 40MB, matching attn_block: under lax.scan the stacked-weight
            # blocks add scoped vmem on top of the kernel's own allocation
            # (L/16-384 compiles to 32.04MB at b=8 / 36.66MB at b=64 post
            # round-4 refactor; see attn_block for the margin reasoning).
            vmem_limit_bytes=40 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sp * d * 4 * d + 4 * b * sp * sp * d,
            bytes_accessed=(2 * b * sp * d + 4 * d * d) * x.dtype.itemsize,
            transcendentals=b * sp * sp),
        interpret=interpret,
    )(idx, *args)
    return out.reshape(b, sp, d)


# ----------------------------------------------- int8-dot attention block --

def _attn_q_core(x32, g_ref, b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                 wout_ref, sout_ref, *, eps: float, dl: int, sp: int,
                 num_heads: int, head_dim: int, scale: float, seq_len: int,
                 precision, cdtype):
    """LN -> int8 QKV -> float MHA -> int8 output projection, fp32 result
    WITHOUT residual or output bias. ``dl = num_heads * head_dim`` is the
    projection width — the full hidden dim for the single-device kernel,
    this shard's head columns for the tensor-parallel partial form.

    The LN image and the per-head context are dynamically quantized per
    row (symmetric max-abs/127, the vit_tpu.quant scheme) and the four
    projection dots run s8 x s8 -> s32 on the MXU's double-rate path.
    The attention CORE (scores, softmax, context) stays float — its
    operands are activations x activations, so there is no weight scale
    to fold a quantization into, and it is the accuracy-critical part.
    """
    f32 = jnp.float32
    xn = _ln32(x32, g_ref, b_ref, eps)
    ax = jnp.maximum(jnp.max(jnp.abs(xn), axis=-1, keepdims=True),
                     1e-12) / 127.0
    xq = jnp.round(xn / ax).astype(jnp.int8)

    proj = []
    for p_i in range(3):
        cols = slice(p_i * dl, (p_i + 1) * dl)
        z = jax.lax.dot_general(
            xq, wqkv_ref[:, cols], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        z = (z.astype(f32) * ax * sqkv_ref[:, cols]
             + bqkv_ref[:, cols].astype(f32))
        proj.append(z.astype(cdtype))
    q_all, k_all, v_all = proj

    parts = []
    for h in range(num_heads):
        hs = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q_all[:, hs], k_all[:, hs], (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=precision) * scale
        if seq_len != sp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < seq_len, s, float("-inf"))
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(cdtype), v_all[:, hs], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=precision)
        parts.append(ctx / l)
    ctx_all = jnp.concatenate(parts, axis=1)  # fp32

    ac = jnp.maximum(jnp.max(jnp.abs(ctx_all), axis=-1, keepdims=True),
                     1e-12) / 127.0
    cq = jnp.round(ctx_all / ac).astype(jnp.int8)
    out = jax.lax.dot_general(
        cq, wout_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return out.astype(f32) * ac * sout_ref[:]


def _attn_q_kernel(x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                   wout_ref, sout_ref, bout_ref, o_ref, *, eps: float,
                   d: int, sp: int, num_heads: int, head_dim: int,
                   scale: float, seq_len: int, group: int, precision):
    """:func:`_attn_kernel` with the QKV and output PROJECTIONS in int8
    (see :func:`_attn_q_core` for the quantization scheme)."""
    for g in range(group):
        rows = slice(g * sp, (g + 1) * sp)
        x32 = x_ref[rows, :].astype(jnp.float32)
        out = _attn_q_core(
            x32, g_ref, b_ref, wqkv_ref, sqkv_ref, bqkv_ref, wout_ref,
            sout_ref, eps=eps, dl=d, sp=sp, num_heads=num_heads,
            head_dim=head_dim, scale=scale, seq_len=seq_len,
            precision=precision, cdtype=x_ref.dtype)
        out = out + bout_ref[:].astype(jnp.float32)
        o_ref[rows, :] = (out + x32).astype(o_ref.dtype)


def _attn_q_partial_kernel(x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref,
                           bqkv_ref, wout_ref, sout_ref, o_ref, *,
                           eps: float, d: int, dl: int, sp: int,
                           num_heads: int, head_dim: int, scale: float,
                           seq_len: int, group: int, precision):
    """Tensor-parallel shard form of :func:`_attn_q_kernel`: this shard's
    LOCAL heads through LN -> int8 QKV_shard -> float MHA -> int8
    proj_shard, emitting the output-projection PARTIAL SUM (no residual,
    no output bias — the caller adds both once after the cross-shard
    ``lax.psum``; see :mod:`vit_tpu.parallel.tp_pallas`). The per-output-
    channel ``sout`` scale distributes over the shard sum, so applying it
    per shard is exact."""
    for g in range(group):
        rows = slice(g * sp, (g + 1) * sp)
        out = _attn_q_core(
            x_ref[rows, :].astype(jnp.float32), g_ref, b_ref, wqkv_ref,
            sqkv_ref, bqkv_ref, wout_ref, sout_ref, eps=eps, dl=dl, sp=sp,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            seq_len=seq_len, precision=precision, cdtype=x_ref.dtype)
        o_ref[rows, :] = out.astype(o_ref.dtype)


def attn_block_q_plan(b: int, sp: int, d: int, num_heads: int,
                      itemsize: int, budget: int = _VMEM_BUDGET):
    """Group size for :func:`attn_block_q`, or None if no config fits.

    Always an mstream-style plan (there is no int8 wstream kernel — the
    small-batch latency regime belongs to :func:`encoder_stack_q`), sized
    with the REAL int8 weight footprint (4d² bytes vs the float plan's
    4d²·itemsize) plus the xq/cq int8 row scratch, so geometries the
    float planner routes to wstream still get a kernel here.

    Resolution: ``VIT_TPU_ATTNQ_PLAN`` env (tune.py's config forcing,
    budget-gated) > tuned entry (op ``attnqblock``, group clamped to a
    feasible divisor of b) > largest budget-feasible divisor of b.
    """
    if d % 128 or sp % 8 or d % num_heads:
        return None
    w = 4 * d * d + 4 * 4 * d                       # int8 weights + scales
    per_batch = (2 * 2 * sp * d * itemsize          # x + out dbuf
                 + sp * d * (4 + 3 * itemsize)      # fp32 proj + q/k/v
                 + sp * sp * 4 * 2                  # scores + probs fp32
                 + sp * d * 4                       # ctx fp32
                 + 2 * sp * d)                      # xq + cq int8
    if w + per_batch > budget:
        return None

    def feasible(g):
        return g >= 1 and b % g == 0 and w + g * per_batch <= budget

    env = os.environ.get("VIT_TPU_ATTNQ_PLAN")
    if env:
        g = int(env)
        return g if feasible(g) else None
    from vit_tpu.ops.pallas import tuning
    dtype = {2: jnp.bfloat16, 4: jnp.float32}.get(itemsize, jnp.float32)
    hit = tuning.lookup("attnqblock", dtype, (b, sp, d, num_heads))
    if hit is not None:
        # Clamp to >=1 before walking down: feasible() is False for every
        # non-positive g, so a corrupt/hand-edited entry storing group<=0
        # must not loop forever. g=1 is always feasible here (the
        # w+per_batch<=budget gate above already admitted it).
        g = max(int(hit["group"]), 1)
        while not feasible(g):
            g -= 1
        return g
    group = b
    while not feasible(group):
        group -= 1
    return group


def attn_block_q(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                 wqkv_q: jax.Array, sqkv: jax.Array, bqkv: jax.Array,
                 wout_q: jax.Array, sout: jax.Array, bout: jax.Array,
                 *, num_heads: int, scale: float | None = None,
                 seq_len: int | None = None, eps: float = 1e-12,
                 interpret: bool = False) -> jax.Array:
    """Int8-projection ``x + proj(MHA(LN(x)))`` in one Pallas pass.

    ``wqkv_q`` (D, 3D) / ``wout_q`` (D, D) int8 with fp32 per-output-
    channel scales ``sqkv`` (3D,) / ``sout`` (D,) from
    :func:`vit_tpu.quant.quantize_weight`; activations are quantized
    per row inside the kernel (the XLA tier's numerics). Requires a
    group from :func:`attn_block_q_plan` (caller gates on it).
    """
    b, sp, d = x.shape
    hd = d // num_heads
    assert wqkv_q.dtype == jnp.int8 and wout_q.dtype == jnp.int8
    assert wqkv_q.shape == (d, 3 * d) and wout_q.shape == (d, d)
    if scale is None:
        scale = hd ** -0.5
    if seq_len is None:
        seq_len = sp
    group = attn_block_q_plan(b, sp, d, num_heads, x.dtype.itemsize)
    assert group is not None, (b, sp, d, num_heads, x.dtype)
    xf = x.reshape(b * sp, d)

    kernel = functools.partial(
        _attn_q_kernel, eps=eps, d=d, sp=sp, num_heads=num_heads,
        head_dim=hd, scale=scale, seq_len=seq_len, group=group,
        precision=_dot_precision(x.dtype))
    blk = pl.BlockSpec((group * sp, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            blk,                                            # x
            vec(d), vec(d),                                 # ln scale/bias
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # wqkv int8
            vec(3 * d),                                     # sqkv fp32
            vec(3 * d),                                     # bqkv
            pl.BlockSpec((d, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # wout int8
            vec(d),                                         # sout fp32
            vec(d),                                         # bout
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b * sp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=28 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sp * d * 4 * d + 4 * b * sp * sp * d,
            bytes_accessed=2 * b * sp * d * x.dtype.itemsize + 4 * d * d,
            transcendentals=b * sp * sp),
        interpret=interpret,
    )(xf, ln_scale.reshape(1, d), ln_bias.reshape(1, d),
      wqkv_q, sqkv.reshape(1, 3 * d).astype(jnp.float32),
      bqkv.reshape(1, 3 * d),
      wout_q, sout.reshape(1, d).astype(jnp.float32), bout.reshape(1, d))
    return out.reshape(b, sp, d)


# -------------------------------- tensor-parallel int8 attention partial --

def attn_block_q_partial_plan(b: int, sp: int, d: int, dl: int,
                              itemsize: int, budget: int = _VMEM_BUDGET):
    """``{"group": g}`` plan for :func:`attn_block_q_partial`, or None.

    Sized with the REAL int8 weight footprint (the shard's 4*d*dl bytes)
    plus the xq/cq int8 row scratch — the int8 counterpart of
    :func:`attn_block_partial_plan`; ``dl`` must be lane-aligned so the
    per-head column slices tile."""
    if d % 128 or dl % 128 or sp % 8:
        return None
    w = 4 * d * dl + 4 * (3 * dl + d)               # int8 weights + scales
    per_batch = (2 * 2 * sp * d * itemsize          # x + out dbuf
                 + sp * dl * (4 + 3 * itemsize)     # fp32 z + q/k/v
                 + sp * sp * 4 * 2                  # scores + probs fp32
                 + sp * dl * 4                      # ctx fp32
                 + sp * (d + dl))                   # xq + cq int8
    if w + per_batch > budget:
        return None
    group = b
    while b % group or w + group * per_batch > budget:
        group -= 1
    return {"group": group}


def attn_block_q_partial(x: jax.Array, ln_scale: jax.Array,
                         ln_bias: jax.Array, wqkv_q: jax.Array,
                         sqkv: jax.Array, bqkv: jax.Array,
                         wout_q: jax.Array, sout: jax.Array, *,
                         num_heads: int, scale: float | None = None,
                         seq_len: int | None = None, eps: float = 1e-12,
                         interpret: bool = False) -> jax.Array:
    """``proj_shard(MHA_shard(LN(x)))`` with int8 projections — one TP
    shard's attention half on the quant tier.

    ``x``: (B, S, D) replicated over 'model'; ``wqkv_q``: (D, 3*dl) int8
    packed ``[q_s|k_s|v_s]`` head-major (``dl = local_heads * head_dim``),
    with fp32 scales ``sqkv`` (3*dl,) and bias ``bqkv`` (3*dl,);
    ``wout_q``: (dl, D) int8 with fp32 scale ``sout`` (D,) — per-OUTPUT-
    channel, so replicated across shards and exact under the shard sum.
    Returns the partial sum to ``lax.psum`` over 'model'; residual and
    output bias are NOT included (add once post-psum)."""
    b, sp, d = x.shape
    dl = wqkv_q.shape[1] // 3
    hd = dl // num_heads
    assert wqkv_q.dtype == jnp.int8 and wout_q.dtype == jnp.int8
    assert wqkv_q.shape == (d, 3 * dl) and wout_q.shape == (dl, d), (
        wqkv_q.shape, wout_q.shape)
    if scale is None:
        scale = hd ** -0.5
    if seq_len is None:
        seq_len = sp
    plan = attn_block_q_partial_plan(b, sp, d, dl, x.dtype.itemsize)
    assert plan is not None, (b, sp, d, dl, x.dtype)
    group = plan["group"]
    xf = x.reshape(b * sp, d)

    kernel = functools.partial(
        _attn_q_partial_kernel, eps=eps, d=d, dl=dl, sp=sp,
        num_heads=num_heads, head_dim=hd, scale=scale, seq_len=seq_len,
        group=group, precision=_dot_precision(x.dtype))
    blk = pl.BlockSpec((group * sp, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            blk,                                            # x
            vec(d), vec(d),                                 # ln scale/bias
            pl.BlockSpec((d, 3 * dl), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # wqkv int8 shard
            vec(3 * dl),                                    # sqkv fp32
            vec(3 * dl),                                    # bqkv shard
            pl.BlockSpec((dl, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # wout int8 shard
            vec(d),                                         # sout fp32
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b * sp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=29 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sp * d * 4 * dl + 4 * b * sp * sp * dl,
            bytes_accessed=2 * b * sp * d * x.dtype.itemsize + 4 * d * dl,
            transcendentals=b * sp * sp),
        interpret=interpret,
    )(xf, ln_scale.reshape(1, d), ln_bias.reshape(1, d),
      wqkv_q, sqkv.reshape(1, 3 * dl).astype(jnp.float32),
      bqkv.reshape(1, 3 * dl),
      wout_q, sout.reshape(1, d).astype(jnp.float32))
    return out.reshape(b, sp, d)


# ------------------------------------------- stacked int8 blocks (scan path) --

def mlp_block_q_stacked(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                        w1q: jax.Array, s1: jax.Array, b1: jax.Array,
                        w2q: jax.Array, s2: jax.Array, b2: jax.Array,
                        idx: jax.Array, *, eps: float = 1e-12,
                        i8dot: bool = True,
                        interpret: bool = False) -> jax.Array:
    """Stacked-weight form of the int8 MLP mega-kernels — the int8
    counterpart of :func:`mlp_block_stacked` (see its docstring: under
    ``lax.scan`` per-layer dynamic slices of the stacked params cost an
    HBM->HBM copy each because ``pallas_call`` is opaque to XLA).

    ``i8dot=True`` runs :func:`_mlp_i8dot_kernel` (s8 x s8 -> s32 dots,
    the throughput tier); ``i8dot=False`` runs :func:`_mlp_q_kernel`
    (weight-only, float dots). Both kernels share one ref signature, so
    this single launcher serves both.

    ``ln_scale``/``ln_bias``/``s2``/``b2``: (L, D); ``w1q``: (L, D, mlp)
    int8; ``s1``/``b1``: (L, mlp); ``w2q``: (L, mlp, D) int8; ``idx``:
    int32 scalar. Same plans as the per-layer forms.
    """
    *lead, d = x.shape
    l, mlp = w1q.shape[0], w1q.shape[2]
    assert w1q.dtype == jnp.int8 and w2q.dtype == jnp.int8
    assert w1q.shape == (l, d, mlp) and w2q.shape == (l, mlp, d)
    xf = x.reshape(-1, d)
    m = xf.shape[0]
    plan = mlp_block_plan_i8(m, d, mlp, x.dtype.itemsize)
    assert plan is not None, (m, d, mlp, x.dtype)
    bm, nt, ct = plan
    mt = mlp // nt
    nc = mt // ct

    if i8dot:
        kernel = functools.partial(_mlp_i8dot_kernel, eps=eps, d=d, nt=nt,
                                   nc=nc, ct=ct)
        scratch = [
            pltpu.VMEM((bm, d), jnp.int8),     # quantized xn
            pltpu.VMEM((bm, 1), jnp.float32),  # per-row activation scales
            pltpu.VMEM((bm, d), jnp.float32),  # residual-seeded accumulator
        ]
    else:
        kernel = functools.partial(_mlp_q_kernel, eps=eps, d=d, nt=nt,
                                   nc=nc, ct=ct,
                                   precision=_dot_precision(x.dtype))
        scratch = [
            pltpu.VMEM((bm, d), x.dtype),      # xn cache
            pltpu.VMEM((bm, d), jnp.float32),  # residual-seeded accumulator
        ]

    vec = lambda n, im: pl.BlockSpec((None, 1, n), im,
                                     memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cdiv(m, bm), nt),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, t, s: (i, 0),
                         memory_space=pltpu.VMEM),                  # x
            vec(d, lambda i, t, s: (s[0], 0, 0)),                   # ln scale
            vec(d, lambda i, t, s: (s[0], 0, 0)),                   # ln bias
            pl.BlockSpec((None, d, mt), lambda i, t, s: (s[0], 0, t),
                         memory_space=pltpu.VMEM),                  # w1 int8
            vec(mt, lambda i, t, s: (s[0], 0, t)),                  # s1
            vec(mt, lambda i, t, s: (s[0], 0, t)),                  # b1
            pl.BlockSpec((None, mt, d), lambda i, t, s: (s[0], t, 0),
                         memory_space=pltpu.VMEM),                  # w2 int8
            vec(d, lambda i, t, s: (s[0], 0, 0)),                   # s2
            vec(d, lambda i, t, s: (s[0], 0, 0)),                   # b2
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, t, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        lambda s_ref, *args: kernel(*args),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=28 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * mlp,
            bytes_accessed=2 * m * d * x.dtype.itemsize + 2 * d * mlp,
            transcendentals=m * mlp),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), xf,
      ln_scale.reshape(l, 1, d), ln_bias.reshape(l, 1, d),
      w1q, s1.reshape(l, 1, mlp).astype(jnp.float32),
      b1.reshape(l, 1, mlp),
      w2q, s2.reshape(l, 1, d).astype(jnp.float32), b2.reshape(l, 1, d))
    return out.reshape(*lead, d)


def attn_block_q_stacked(x: jax.Array, ln_scale: jax.Array,
                         ln_bias: jax.Array, wqkv_q: jax.Array,
                         sqkv: jax.Array, bqkv: jax.Array,
                         wout_q: jax.Array, sout: jax.Array,
                         bout: jax.Array, idx: jax.Array, *, num_heads: int,
                         scale: float | None = None,
                         seq_len: int | None = None, eps: float = 1e-12,
                         interpret: bool = False) -> jax.Array:
    """:func:`attn_block_q` reading layer ``idx``'s int8 weights DIRECTLY
    from the scan-stacked (L, ...) arrays via scalar-prefetch index maps
    (see :func:`mlp_block_q_stacked`).

    ``ln_scale``/``ln_bias``/``sout``/``bout``: (L, D); ``wqkv_q``:
    (L, D, 3D) int8; ``sqkv``/``bqkv``: (L, 3D); ``wout_q``: (L, D, D)
    int8; ``idx``: int32 scalar. Same plan as the per-layer form.
    """
    b, sp, d = x.shape
    hd = d // num_heads
    l = wqkv_q.shape[0]
    assert wqkv_q.dtype == jnp.int8 and wout_q.dtype == jnp.int8
    assert wqkv_q.shape == (l, d, 3 * d) and wout_q.shape == (l, d, d)
    if scale is None:
        scale = hd ** -0.5
    if seq_len is None:
        seq_len = sp
    group = attn_block_q_plan(b, sp, d, num_heads, x.dtype.itemsize)
    assert group is not None, (b, sp, d, num_heads, x.dtype)
    xf = x.reshape(b * sp, d)

    kernel = functools.partial(
        _attn_q_kernel, eps=eps, d=d, sp=sp, num_heads=num_heads,
        head_dim=hd, scale=scale, seq_len=seq_len, group=group,
        precision=_dot_precision(x.dtype))
    blk = pl.BlockSpec((group * sp, d), lambda i, s: (i, 0),
                       memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((None, 1, n), lambda i, s: (s[0], 0, 0),
                                 memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // group,),
        in_specs=[
            blk,                                                # x
            vec(d), vec(d),                                     # ln scale/bias
            pl.BlockSpec((None, d, 3 * d), lambda i, s: (s[0], 0, 0),
                         memory_space=pltpu.VMEM),              # wqkv int8
            vec(3 * d),                                         # sqkv fp32
            vec(3 * d),                                         # bqkv
            pl.BlockSpec((None, d, d), lambda i, s: (s[0], 0, 0),
                         memory_space=pltpu.VMEM),              # wout int8
            vec(d),                                             # sout fp32
            vec(d),                                             # bout
        ],
        out_specs=blk,
    )
    out = pl.pallas_call(
        lambda s_ref, *args: kernel(*args),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * sp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # 29MB like attn_block_stacked: the stacked-weight blocks add
            # scoped vmem on top of the kernel's own allocation under scan.
            vmem_limit_bytes=29 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sp * d * 4 * d + 4 * b * sp * sp * d,
            bytes_accessed=2 * b * sp * d * x.dtype.itemsize + 4 * d * d,
            transcendentals=b * sp * sp),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), xf,
      ln_scale.reshape(l, 1, d), ln_bias.reshape(l, 1, d),
      wqkv_q, sqkv.reshape(l, 1, 3 * d).astype(jnp.float32),
      bqkv.reshape(l, 1, 3 * d),
      wout_q, sout.reshape(l, 1, d).astype(jnp.float32),
      bout.reshape(l, 1, d))
    return out.reshape(b, sp, d)


# ------------------------------------------------------------- layer block --

def _layer_kernel(x_ref, g1_ref, bn1_ref, wqkv_ref, bqkv_ref, wout_ref,
                  bout_ref, g2_ref, bn2_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  o_ref, *, eps: float, d: int, sp: int, num_heads: int,
                  head_dim: int, scale: float, seq_len: int, group: int,
                  nc: int, ct: int, precision):
    """A FULL encoder layer for ``group`` batch segments in one pass:
    ``y = x + proj(MHA(LN1 x))`` then ``y + fc2(gelu(fc1(LN2 y)))``.

    vs the attn_block + mlp_block pair this removes the HBM round trip of
    the inter-half activation y (2·sp·D·itemsize per batch per layer —
    ~20 MB/layer at B/16 bs=32 bf16) and halves the grid-step count. All
    four weight matrices stay VMEM-resident across the batch grid; the MLP
    hidden is produced in (sp, ct) chunks like :func:`_mlp_kernel`.
    """
    for g in range(group):
        rows = slice(g * sp, (g + 1) * sp)
        y32 = _attn_core(
            x_ref[rows, :].astype(jnp.float32), g1_ref, bn1_ref, wqkv_ref,
            bqkv_ref, wout_ref, bout_ref, eps=eps, d=d, sp=sp,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            seq_len=seq_len, precision=precision, cdtype=x_ref.dtype)

        xn2 = _ln32(y32, g2_ref, bn2_ref, eps).astype(x_ref.dtype)
        acc = y32 + b2_ref[:].astype(jnp.float32)
        for c in range(nc):
            sl = slice(c * ct, (c + 1) * ct)
            h = jax.lax.dot_general(
                xn2, w1_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            h = gelu(h + b1_ref[:, sl].astype(jnp.float32)).astype(xn2.dtype)
            acc = acc + jax.lax.dot_general(
                h, w2_ref[sl, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        o_ref[rows, :] = acc.astype(o_ref.dtype)


def layer_block_plan(b: int, sp: int, d: int, mlp: int, num_heads: int,
                     itemsize: int, budget: int = _VMEM_BUDGET):
    """{"group": g, "ct": ct} for :func:`layer_block`, or None.

    Opt-in like the encoder stack: a plan is returned only when forced via
    ``VIT_TPU_LAYER_PLAN`` ("<group>,<ct>") or when the tuner recorded a
    per-shape win (op ``layerblock``, dims (b, sp, d, mlp, heads) — the
    sweep only records a winner that beats the tuned attn_block +
    mlp_block pair, so an entry existing IS the routing decision)."""
    if d % 128 or sp % 8 or d % num_heads or mlp % 128:
        return None

    def feasible(group, ct):
        group = min(int(group), b)
        while b % group:
            group -= 1
        ct = min(int(ct), mlp)
        while mlp % ct:
            ct -= 128
        if ct <= 0:
            return None
        w = (4 * d * d + 2 * d * mlp) * itemsize     # wqkv+wout+w1+w2
        per_batch = (2 * 2 * sp * d * itemsize       # x + out dbuf
                     + sp * d * (4 + 3 * itemsize)   # fp32 proj + q/k/v
                     + 2 * sp * sp * 4               # scores + probs fp32
                     + sp * d * 4                    # ctx fp32
                     + sp * d * (4 + itemsize)       # y32 + xn2
                     + sp * ct * (4 + itemsize)      # hidden chunk
                     + sp * d * 4)                   # fp32 acc
        if w + group * per_batch > budget:
            return None
        return {"group": group, "ct": ct}

    env = os.environ.get("VIT_TPU_LAYER_PLAN")
    if env:
        g_, ct_ = map(int, env.split(","))
        return feasible(g_, ct_)
    from vit_tpu.ops.pallas import tuning
    dtype = {2: jnp.bfloat16, 4: jnp.float32}.get(itemsize, jnp.float32)
    exact, wild = tuning.lookup_split("layerblock", dtype,
                                      (b, sp, d, mlp, num_heads))
    for hit in (exact, wild):
        if hit is not None:
            return feasible(hit["group"], hit["ct"])
    return None


def layer_block(x: jax.Array, ln1_scale, ln1_bias, wqkv, bqkv, wout, bout,
                ln2_scale, ln2_bias, w1, b1, w2, b2, *, num_heads: int,
                scale: float | None = None, seq_len: int | None = None,
                eps: float = 1e-12, plan: dict | None = None,
                interpret: bool = False) -> jax.Array:
    """One full encoder layer in ONE Pallas pass (see :func:`_layer_kernel`).

    ``x``: (B, S, D), S sublane-aligned; weights in the model's packed
    (in, out) convention. Requires a plan (caller gates on
    :func:`layer_block_plan`, or passes one explicitly for tests)."""
    b, sp, d = x.shape
    mlp = w1.shape[1]
    hd = d // num_heads
    assert wqkv.shape == (d, 3 * d) and wout.shape == (d, d)
    assert w1.shape == (d, mlp) and w2.shape == (mlp, d)
    if scale is None:
        scale = hd ** -0.5
    if seq_len is None:
        seq_len = sp
    if plan is None:
        plan = layer_block_plan(b, sp, d, mlp, num_heads, x.dtype.itemsize)
    if plan is None and interpret:
        # Interpret mode (tests) has no VMEM constraint and no tuning gate.
        plan = {"group": 1, "ct": mlp}
    assert plan is not None, (b, sp, d, mlp, num_heads, x.dtype)
    group, ct = plan["group"], plan["ct"]

    kernel = functools.partial(
        _layer_kernel, eps=eps, d=d, sp=sp, num_heads=num_heads,
        head_dim=hd, scale=scale, seq_len=seq_len, group=group,
        nc=mlp // ct, ct=ct, precision=_dot_precision(x.dtype))
    blk = pl.BlockSpec((group * sp, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    whole = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            blk,                                    # x
            whole(1, d), whole(1, d),               # ln1
            whole(d, 3 * d), whole(1, 3 * d),       # wqkv, bqkv
            whole(d, d), whole(1, d),               # wout, bout
            whole(1, d), whole(1, d),               # ln2
            whole(d, mlp), whole(1, mlp),           # w1, b1
            whole(mlp, d), whole(1, d),             # w2, b2
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b * sp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=28 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sp * d * (4 * d + 2 * mlp) + 4 * b * sp * sp * d,
            bytes_accessed=(2 * b * sp * d + 4 * d * d + 2 * d * mlp)
            * x.dtype.itemsize,
            transcendentals=b * sp * (sp + mlp)),
        interpret=interpret,
    )(x.reshape(b * sp, d), ln1_scale.reshape(1, d), ln1_bias.reshape(1, d),
      wqkv, bqkv.reshape(1, 3 * d), wout, bout.reshape(1, d),
      ln2_scale.reshape(1, d), ln2_bias.reshape(1, d),
      w1, b1.reshape(1, mlp), w2, b2.reshape(1, d))
    return out.reshape(b, sp, d)


# ----------------------------------------------------------- encoder stack --

def _encoder_stack_kernel(*refs, eps: float, d: int,
                          sp: int, num_heads: int, head_dim: int,
                          scale: float, seq_len: int, b: int, nq: int,
                          cq: int, nt: int, num_layers: int, precision,
                          n_tok: int = 0, fold_ln: bool = False,
                          flat: bool = False):
    """The WHOLE pre-LN encoder in one kernel: grid (L, nq + b + nt).

    Sub-step schedule per layer l:
    - ``t < nq``        — QKV projection column chunk t (LN1 recomputed
      per row block from the resident activation; no xn scratch);
    - ``t == nq + g``   — attention + out-projection + residual for
      batch g, updating the resident activation in place;
    - ``t == nq+b+c``   — MLP tile c accumulating into the fp32 acc (LN2
      recomputed per row block), last tile writes the activation back.

    Layer l+1's weight tiles prefetch while layer l computes — the
    cross-layer overlap no sequence of per-layer kernels can get — so at
    small batch the forward runs at the weight-bandwidth floor. The
    activation (B*sp, D), packed QKV and fp32 MLP accumulator live in
    VMEM scratch for the kernel's entire lifetime; x is read once at
    (0,0) and the output written once at the final step.

    ``n_tok > 0`` is the embed-folded form (VERDICT round-3 item 7): the
    leading refs are (patches, wemb, bemb, cls_row, pos) instead of x, and
    step (0,0) computes the patch projection + CLS row + position add +
    pad-to-sp IN-KERNEL while layer 0's first QKV window streams in — the
    separate embed kernel's dispatch and the (m,d) HBM round trip of the
    embedding disappear. ``fold_ln`` appends (gf, bf) after the encoder
    weights and applies the model's FINAL LayerNorm to the last step's
    write, removing the tail kernel the same way.

    ``flat`` runs the same schedule on a 1-D grid (L * T,) with l/t
    derived by divmod — removing the layer boundary from the grid lets
    Mosaic pipeline the weight-window stream across layers (round-5
    probe: core body 27.5 -> 24.9 us/layer at b=1 B/16). Opt-in per
    tuned plan (``{"flat": 1}``), measurement-gated like every other
    stack decision.
    """
    if n_tok:
        p_ref, we_ref, base_ref, *refs = refs
    else:
        x_ref, *refs = refs
    (g1_ref, bn1_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, g2_ref,
     bn2_ref, w1_ref, b1_ref, w2_ref, b2_ref, *refs) = refs
    if fold_ln:
        gf_ref, bf_ref, *refs = refs
    o_ref, xcur_ref, qkv_ref, acc_ref = refs
    if flat:
        i = pl.program_id(0)
        T = nq + b + nt
        l, t = i // T, i % T
    else:
        l = pl.program_id(0)
        t = pl.program_id(1)
    f32 = jnp.float32

    def ln(rows, g_ref, b_ref, x32=None):
        if x32 is None:
            x32 = xcur_ref[rows, :].astype(f32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
        return ((xn * g_ref[0].astype(f32) + b_ref[0].astype(f32))
                .astype(xcur_ref.dtype))

    @pl.when((l == 0) & (t == 0))
    def _():
        if n_tok:
            # In-kernel patch embed: one (b*n_tok, pd) x (pd, d) MXU pass,
            # then per-image scatter of [cls | proj + pos + bias | 0 pad]
            # (base = that row matrix with zeros where patch rows go).
            z = jax.lax.dot_general(
                p_ref[:], we_ref[:],
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
                precision=precision)
            for g in range(b):
                r0 = g * sp
                xcur_ref[r0:r0 + 1, :] = base_ref[0:1, :]
                xcur_ref[r0 + 1:r0 + 1 + n_tok, :] = (
                    z[g * n_tok:(g + 1) * n_tok]
                    + base_ref[1:1 + n_tok, :].astype(f32)
                ).astype(xcur_ref.dtype)
                if 1 + n_tok < sp:
                    xcur_ref[r0 + 1 + n_tok:r0 + sp, :] = (
                        base_ref[1 + n_tok:sp, :])
        else:
            xcur_ref[:] = x_ref[:]

    for j in range(nq):
        @pl.when(t == j)
        def _(j=j):
            start = j * cq
            rows = slice(None)
            xn = ln(rows, g1_ref, bn1_ref)
            z = jax.lax.dot_general(
                xn, wqkv_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision)
            z = (z + bqkv_ref[0, 0].astype(f32)).astype(qkv_ref.dtype)
            # Scatter the chunk into the per-projection slabs it spans
            # (cq may be a divisor OR a multiple of d).
            for p in range(3):
                lo = max(start, p * d)
                hi = min(start + cq, (p + 1) * d)
                if lo < hi:
                    qkv_ref[p, rows, lo - p * d:hi - p * d] = (
                        z[:, lo - start:hi - start])

    for g in range(b):
        @pl.when(t == nq + g)
        def _(g=g):
            rows = slice(g * sp, (g + 1) * sp)
            q_all = qkv_ref[0, rows, :]
            k_all = qkv_ref[1, rows, :]
            v_all = qkv_ref[2, rows, :]
            parts = []
            for h in range(num_heads):
                hs = slice(h * head_dim, (h + 1) * head_dim)
                s = jax.lax.dot_general(
                    q_all[:, hs], k_all[:, hs], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32, precision=precision) * scale
                if seq_len != sp:
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(col < seq_len, s, float("-inf"))
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                den = jnp.sum(p, axis=-1, keepdims=True)
                ctx = jax.lax.dot_general(
                    p.astype(v_all.dtype), v_all[:, hs],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=precision)
                parts.append(ctx / den)
            ctx_all = jnp.concatenate(parts, axis=1).astype(xcur_ref.dtype)
            out = jax.lax.dot_general(
                ctx_all, wout_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision)
            out = (out + bout_ref[0, 0].astype(f32)
                   + xcur_ref[rows, :].astype(f32))
            xcur_ref[rows, :] = out.astype(xcur_ref.dtype)

    for c in range(nt):
        @pl.when(t == nq + b + c)
        def _(c=c):
            if c == 0:
                acc_ref[:] = (xcur_ref[:].astype(f32)
                              + b2_ref[0].astype(f32))
            xn = ln(slice(None), g2_ref, bn2_ref)
            h = jax.lax.dot_general(
                xn, w1_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision)
            h = gelu(h + b1_ref[0, 0].astype(f32)).astype(xn.dtype)
            acc_ref[:] += jax.lax.dot_general(
                h, w2_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision)
            if c == nt - 1:
                xcur_ref[:] = acc_ref[:].astype(xcur_ref.dtype)

                @pl.when(l == num_layers - 1)
                def _():
                    if fold_ln:
                        o_ref[:] = ln(slice(None), gf_ref, bf_ref,
                                      acc_ref[:])
                    else:
                        o_ref[:] = xcur_ref[:]


def _stack_grid(L: int, T: int, flat: bool):
    """(grid, index-map lifter) for the encoder-stack kernels: the default
    (L, T) grid, or the 1-D flat grid (L*T,) whose index maps derive
    (l, t) by divmod (see ``_encoder_stack_kernel``'s ``flat``)."""
    if flat:
        def ix(fn):
            return lambda i: fn(i // T, i % T)
        return (L * T,), ix
    return (L, T), (lambda fn: fn)


def _stack_feasible(b: int, sp: int, d: int, mlp: int, itemsize: int,
                    cq: int, mt: int, budget: int, extra: int = 0,
                    w_itemsize: int | None = None):
    """VMEM-feasibility of an encoder-stack (cq, mt) tile config: the whole
    (B*sp, D) activation plus its fp32 MLP accumulator and packed QKV must
    be resident alongside the double-buffered weight tiles of two
    consecutive layers. ``extra`` charges bytes for optional resident
    inputs (the embed-folded form's patches/wemb/base). ``w_itemsize``
    overrides the WEIGHT byte width (the int8 stack streams 1-byte tiles
    and casts each to the compute dtype on use, so it charges 1 B/elem of
    window plus the cast-tile temps at ``itemsize`` — summed over the
    tiles cast within one grid step: the MLP step casts BOTH its w1
    (d, mt) and w2 (mt, d) tiles in the same body). Returns the full
    plan dict or None."""
    if (3 * d) % cq or cq % 128 or mlp % mt or mt % 128:
        return None
    m = b * sp
    wi = itemsize if w_itemsize is None else w_itemsize
    w = (2 * (d * cq + d * mt + mt * d) + 2 * d * d) * wi
    if wi != itemsize:
        # On-the-fly casts to the compute dtype: charge the worst single
        # grid step's SUM of cast tiles (QKV step: (d,cq); proj step:
        # (d,d); MLP step: (d,mt) AND (mt,d) live in one body).
        w += max(d * cq, d * d, d * mt + mt * d) * itemsize
    scratch = m * d * (2 * itemsize + 4) + 3 * m * d * itemsize
    io = 2 * m * d * itemsize
    temps = (m * cq * 4                     # z fp32 (all rows at once)
             + sp * sp * 4 * 2              # scores + probs
             + sp * d * 4                   # ctx / out fp32
             + m * mt * (4 + itemsize))     # mlp hidden
    if w + scratch + io + temps + extra > budget:
        return None
    return {"cq": cq, "nq": 3 * d // cq, "mt": mt, "nt": mlp // mt}


def encoder_stack_plan(b: int, sp: int, d: int, mlp: int, num_heads: int,
                       itemsize: int, budget: int = _VMEM_BUDGET,
                       extra: int = 0):
    """``{"cq", "nq", "mt", "nt"}`` for :func:`encoder_stack`, or None.

    Small-batch only (see :func:`_stack_feasible` for the VMEM model).
    ``extra``: resident bytes the embed-folded form adds (see
    :func:`encoder_stack_fused`).
    """
    if d % 128 or sp % 8 or d % num_heads or mlp % 128:
        return None

    def feasible(cq, mt):
        return _stack_feasible(b, sp, d, mlp, itemsize, cq, mt, budget,
                               extra)

    env = os.environ.get("VIT_TPU_STACK_PLAN")
    if env:
        # "cq,mt" or "cq,mt,flat" (flat=1 -> 1-D grid, _stack_grid).
        parts = [int(v) for v in env.split(",")]
        plan = feasible(parts[0], parts[1])
        if plan is not None and len(parts) > 2 and parts[2]:
            plan["flat"] = 1
        return plan
    from vit_tpu.ops.pallas import tuning
    dtype = {2: jnp.bfloat16, 4: jnp.float32}.get(itemsize, jnp.float32)
    hit = tuning.lookup("encstack", dtype, (b, sp, d, mlp, num_heads))
    if hit is not None:
        plan = feasible(int(hit["cq"]), int(hit["mt"]))
        if plan is not None:
            if hit.get("flat"):
                plan["flat"] = 1
            return plan
    from vit_tpu.ops.dispatch import interpret_mode
    if ((b > 2 or itemsize != 2 or (d, mlp) != (768, 3072))
            and not interpret_mode()):
        # Mosaic scheduling cliff, characterized by the round-4 minimized
        # repro (tools/encstack_minrepro.py; PERF.md 5b): when the
        # per-grid-step body complexity x step count crosses a scheduler
        # threshold, Mosaic abandons cross-step pipelining of the weight-
        # window stream and the kernel runs ~6-10x slow (~300-800 us/layer
        # vs ~47). Measured: at b>=3 EITHER a >=8-head unrolled attention
        # chain OR the LN+GELU chain alone trips it; b<=2 B/16-class bf16
        # is stable under every composition tried (incl. 48 head-blocks).
        # Ruled out by direct measurement: VMEM pressure (limit sweep
        # 28->96 MB inert), DMA-window scheduling (stripped 'dma' variant
        # runs at the weight-stream floor), softmax, head_dim, total
        # unroll size. The boundary is also revision-sensitive (the b=2
        # (768,512) case flipped collapsed->fast across a dead-parameter
        # kernel refactor), so routing is MEASUREMENT-gated, not model-
        # gated: a tuned entry (recorded only on a measured win, re-proven
        # each sweep) overrides above; the untuned heuristic serves only
        # the continuously revalidated stable class (b<=2 bf16,
        # d=768/mlp=3072); everything else runs the per-layer kernels.
        return None
    # Measured ordering on v5e (bs=1 bf16 B/16): cq=d beats both the
    # single-chunk 3d (worse DMA/compute interleave: 0.375 vs 0.320 ms)
    # and d/2 (more per-step bubbles); mt around 1024 is flat. The first
    # feasible (cq, mt) in this preference order wins; the tuned table
    # overrides per shape.
    for cq in (d, d // 2, 3 * d):
        for mt in (1024, 768, 1536, 512, 384, 256):
            plan = feasible(cq, mt)
            if plan is not None:
                return plan
    return None


def encoder_stack_plan_q(b: int, sp: int, d: int, mlp: int, num_heads: int,
                         itemsize: int, budget: int = _VMEM_BUDGET):
    """Stack-vs-layers ROUTE + plan for the int8 tier: the plan for
    :func:`encoder_stack_q`, or None to run the per-layer stacked int8
    kernels instead.

    The int8 stack halves the weight DMA but pays an int8->float cast per
    weight tile on the VPU, and its best (cq, mt) differs from the float
    winner's — measured on v5e B/16 bf16 (round-4 probe): bs=1 per-layer
    stacked int8-dot 0.286 ms vs stack 0.313 (float-tuned plan); bs=2
    per-layer 0.460 vs 0.646 on the float-tuned (768,768) and 0.463 on
    the int8-best (2304,768). So the quant tier routes on its OWN tuned
    entries (op ``encstackq``): ``{"route": "layers"}`` pins the
    per-layer path, ``{"cq","mt"}`` pins the stack with that plan. The
    env force and tuned hits gate on the int8 footprint
    (``_stack_feasible(w_itemsize=1)`` — 1-byte windows + one cast-tile
    temp); geometries without an entry resolve through the float
    :func:`encoder_stack_plan` (conservative float model + the
    Mosaic-cliff geometry gate — only measured wins unlock the stack).
    """
    if d % 128 or sp % 8 or d % num_heads or mlp % 128:
        return None
    env = os.environ.get("VIT_TPU_STACK_PLAN")
    if env:
        # Explicit force (tune.py's candidate sweep): gate on the REAL
        # int8 footprint — the float model's full-width weight windows
        # would veto plans the 1-byte tiles comfortably fit (the L/16
        # geometry's entire candidate set, round-4). "cq,mt[,flat]".
        parts = [int(v) for v in env.split(",")]
        plan = _stack_feasible(b, sp, d, mlp, itemsize, parts[0], parts[1],
                               budget, w_itemsize=1)
        if plan is not None and len(parts) > 2 and parts[2]:
            plan["flat"] = 1
        return plan
    from vit_tpu.ops.pallas import tuning
    dtype = {2: jnp.bfloat16, 4: jnp.float32}.get(itemsize, jnp.float32)
    hit = tuning.lookup("encstackq", dtype, (b, sp, d, mlp, num_heads))
    if hit is not None:
        if hit.get("route") == "layers":
            return None
        plan = _stack_feasible(b, sp, d, mlp, itemsize,
                               int(hit["cq"]), int(hit["mt"]), budget,
                               w_itemsize=1)
        if plan is not None:
            if hit.get("flat"):
                plan["flat"] = 1
            return plan
    return encoder_stack_plan(b, sp, d, mlp, num_heads, itemsize, budget)


def encoder_stack(x: jax.Array, enc: dict, *, num_heads: int,
                  scale: float | None = None, seq_len: int | None = None,
                  eps: float = 1e-12, interpret: bool = False) -> jax.Array:
    """Run the full stacked encoder (``enc`` = scan-stacked params pytree
    with leaves ``ln1/qkv/out/ln2/fc1/fc2``) in ONE Pallas kernel.

    ``x``: (B, sp, D) with sp sublane-aligned; ``seq_len`` masks padded
    keys. Requires :func:`encoder_stack_plan` (caller gates).
    """
    b, sp, d = x.shape
    L, _, three_d = enc["qkv"]["kernel"].shape
    mlp = enc["fc1"]["kernel"].shape[2]
    hd = d // num_heads
    assert three_d == 3 * d
    if scale is None:
        scale = hd ** -0.5
    if seq_len is None:
        seq_len = sp
    plan = encoder_stack_plan(b, sp, d, mlp, num_heads, x.dtype.itemsize)
    assert plan is not None, (b, sp, d, mlp, num_heads, x.dtype)
    cq, nq, mt, nt = plan["cq"], plan["nq"], plan["mt"], plan["nt"]
    flat = bool(plan.get("flat"))
    m = b * sp
    T = nq + b + nt
    grid, ix = _stack_grid(L, T, flat)

    kernel = functools.partial(
        _encoder_stack_kernel, eps=eps, d=d, sp=sp, num_heads=num_heads,
        head_dim=hd, scale=scale, seq_len=seq_len, b=b, nq=nq, cq=cq,
        nt=nt, num_layers=L, precision=_dot_precision(x.dtype), flat=flat)

    full = pl.BlockSpec((m, d), ix(lambda l, t: (0, 0)),
                        memory_space=pltpu.VMEM)
    lvec = lambda n: pl.BlockSpec((1, 1, n), ix(lambda l, t: (l, 0, 0)),
                                  memory_space=pltpu.VMEM)
    last_q, last_m = nq - 1, nt - 1
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            full,                                               # x
            lvec(d), lvec(d),                                   # ln1
            pl.BlockSpec((1, d, cq),
                         ix(lambda l, t: (l, 0, jnp.minimum(t, last_q))),
                         memory_space=pltpu.VMEM),              # wqkv tile
            pl.BlockSpec((1, 1, cq),
                         ix(lambda l, t: (l, 0, jnp.minimum(t, last_q))),
                         memory_space=pltpu.VMEM),              # bqkv tile
            pl.BlockSpec((1, d, d), ix(lambda l, t: (l, 0, 0)),
                         memory_space=pltpu.VMEM),              # wout
            lvec(d),                                            # bout
            lvec(d), lvec(d),                                   # ln2
            pl.BlockSpec((1, d, mt),
                         ix(lambda l, t: (l, 0,
                                          jnp.clip(t - nq - b, 0, last_m))),
                         memory_space=pltpu.VMEM),              # w1 tile
            pl.BlockSpec((1, 1, mt),
                         ix(lambda l, t: (l, 0,
                                          jnp.clip(t - nq - b, 0, last_m))),
                         memory_space=pltpu.VMEM),              # b1 tile
            pl.BlockSpec((1, mt, d),
                         ix(lambda l, t: (l, jnp.clip(t - nq - b, 0, last_m),
                                          0)),
                         memory_space=pltpu.VMEM),              # w2 tile
            lvec(d),                                            # b2
        ],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((m, d), x.dtype),       # resident activation
            pltpu.VMEM((3, m, d), x.dtype),    # packed q/k/v
            pltpu.VMEM((m, d), jnp.float32),   # mlp accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            # Probe knob for the b>=3 scheduling-collapse bisect
            # (tools/encstack_probe.py); 28 MB is the measured-safe default.
            vmem_limit_bytes=int(os.environ.get(
                "VIT_TPU_STACK_VMEM_MB", "28")) * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=L * (2 * m * d * 4 * d + 4 * m * sp * d
                       + 4 * m * d * mlp),
            bytes_accessed=(2 * m * d
                            + L * (4 * d * d + 2 * d * mlp)
                            ) * x.dtype.itemsize,
            transcendentals=L * m * (sp + mlp)),
        interpret=interpret,
    )(x.reshape(m, d),
      enc["ln1"]["scale"].reshape(L, 1, d), enc["ln1"]["bias"].reshape(L, 1, d),
      enc["qkv"]["kernel"], enc["qkv"]["bias"].reshape(L, 1, 3 * d),
      enc["out"]["kernel"], enc["out"]["bias"].reshape(L, 1, d),
      enc["ln2"]["scale"].reshape(L, 1, d), enc["ln2"]["bias"].reshape(L, 1, d),
      enc["fc1"]["kernel"], enc["fc1"]["bias"].reshape(L, 1, mlp),
      enc["fc2"]["kernel"], enc["fc2"]["bias"].reshape(L, 1, d))
    return out.reshape(b, sp, d)


def stack_fused_extra_bytes(b: int, n_tok: int, pd: int, d: int, sp: int,
                            itemsize: int) -> int:
    """Resident VMEM bytes :func:`encoder_stack_fused` adds over
    :func:`encoder_stack`: patches + embed weight + base rows (inputs) and
    the fp32 projection temp, minus the dropped x input."""
    pdp = round_up(pd, 128)
    return ((b * n_tok * pdp + pdp * d + sp * d) * itemsize
            + b * n_tok * d * 4          # z fp32 temp
            - b * sp * d * itemsize)     # x input no longer exists


def encoder_stack_fused(patches: jax.Array, enc: dict, wemb: jax.Array,
                        base: jax.Array, lnf: dict, *, num_heads: int,
                        sp: int, scale: float | None = None,
                        seq_len: int | None = None, eps: float = 1e-12,
                        interpret: bool = False) -> jax.Array:
    """Patch embed + the WHOLE encoder + the final LayerNorm as ONE kernel.

    The embed-folded, LN-folded form of :func:`encoder_stack` (the two
    front/tail kernels disappear; reference scope: vit/vit.py:240-247's
    entire ``embeddings -> encoder -> layernorm`` forward in one launch).
    Step (0,0) computes the patch projection while layer 0's first QKV
    window streams in, so the embed rides DMA time that was previously a
    separate serial kernel.

    ``patches``: (B, n_tok, pd) unfolded images; ``wemb``: (pd, D);
    ``base``: (sp, D) assembled rows [cls+pos0 | pos+bias | 0] (see
    :func:`vit_tpu.models.vit.embed`); ``lnf``: final-LN {scale, bias}.
    Returns (B, sp, D), final-LN applied, pad rows included.
    """
    b, n_tok, pd = patches.shape
    L, _, three_d = enc["qkv"]["kernel"].shape
    d = wemb.shape[1]
    mlp = enc["fc1"]["kernel"].shape[2]
    hd = d // num_heads
    assert three_d == 3 * d and sp >= n_tok + 1
    if scale is None:
        scale = hd ** -0.5
    if seq_len is None:
        seq_len = n_tok + 1
    patches, _ = pad_dim(patches.reshape(b * n_tok, pd), 1, 128)
    wemb, _ = pad_dim(wemb, 0, 128)
    pdp = patches.shape[1]
    extra = stack_fused_extra_bytes(b, n_tok, pd, d, sp,
                                    patches.dtype.itemsize)
    plan = encoder_stack_plan(b, sp, d, mlp, num_heads,
                              patches.dtype.itemsize, extra=extra)
    assert plan is not None, (b, sp, d, mlp, num_heads, patches.dtype)
    cq, nq, mt, nt = plan["cq"], plan["nq"], plan["mt"], plan["nt"]
    flat = bool(plan.get("flat"))
    m = b * sp
    T = nq + b + nt
    grid, ix = _stack_grid(L, T, flat)

    kernel = functools.partial(
        _encoder_stack_kernel, eps=eps, d=d, sp=sp, num_heads=num_heads,
        head_dim=hd, scale=scale, seq_len=seq_len, b=b, nq=nq, cq=cq,
        nt=nt, num_layers=L, precision=_dot_precision(patches.dtype),
        n_tok=n_tok, fold_ln=True, flat=flat)

    full = pl.BlockSpec((m, d), ix(lambda l, t: (0, 0)),
                        memory_space=pltpu.VMEM)
    lvec = lambda n: pl.BlockSpec((1, 1, n), ix(lambda l, t: (l, 0, 0)),
                                  memory_space=pltpu.VMEM)
    cvec = lambda n: pl.BlockSpec((1, 1, n), ix(lambda l, t: (0, 0, 0)),
                                  memory_space=pltpu.VMEM)
    last_q, last_m = nq - 1, nt - 1
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b * n_tok, pdp), ix(lambda l, t: (0, 0)),
                         memory_space=pltpu.VMEM),          # patches
            pl.BlockSpec((pdp, d), ix(lambda l, t: (0, 0)),
                         memory_space=pltpu.VMEM),          # wemb
            pl.BlockSpec((sp, d), ix(lambda l, t: (0, 0)),
                         memory_space=pltpu.VMEM),          # base rows
            lvec(d), lvec(d),                               # ln1
            pl.BlockSpec((1, d, cq),
                         ix(lambda l, t: (l, 0, jnp.minimum(t, last_q))),
                         memory_space=pltpu.VMEM),          # wqkv tile
            pl.BlockSpec((1, 1, cq),
                         ix(lambda l, t: (l, 0, jnp.minimum(t, last_q))),
                         memory_space=pltpu.VMEM),          # bqkv tile
            pl.BlockSpec((1, d, d), ix(lambda l, t: (l, 0, 0)),
                         memory_space=pltpu.VMEM),          # wout
            lvec(d),                                        # bout
            lvec(d), lvec(d),                               # ln2
            pl.BlockSpec((1, d, mt),
                         ix(lambda l, t: (l, 0,
                                          jnp.clip(t - nq - b, 0, last_m))),
                         memory_space=pltpu.VMEM),          # w1 tile
            pl.BlockSpec((1, 1, mt),
                         ix(lambda l, t: (l, 0,
                                          jnp.clip(t - nq - b, 0, last_m))),
                         memory_space=pltpu.VMEM),          # b1 tile
            pl.BlockSpec((1, mt, d),
                         ix(lambda l, t: (l, jnp.clip(t - nq - b, 0, last_m),
                                          0)),
                         memory_space=pltpu.VMEM),          # w2 tile
            lvec(d),                                        # b2
            cvec(d), cvec(d),                               # final LN
        ],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((m, d), patches.dtype),
        scratch_shapes=[
            pltpu.VMEM((m, d), patches.dtype),   # resident activation
            pltpu.VMEM((3, m, d), patches.dtype),  # packed q/k/v
            pltpu.VMEM((m, d), jnp.float32),     # mlp accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=int(os.environ.get(
                "VIT_TPU_STACK_VMEM_MB", "28")) * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=(L * (2 * m * d * 4 * d + 4 * m * sp * d
                        + 4 * m * d * mlp)
                   + 2 * b * n_tok * pd * d),
            bytes_accessed=(2 * m * d + b * n_tok * pd + pd * d
                            + L * (4 * d * d + 2 * d * mlp)
                            ) * patches.dtype.itemsize,
            transcendentals=L * m * (sp + mlp)),
        interpret=interpret,
    )(patches, wemb, base,
      enc["ln1"]["scale"].reshape(L, 1, d), enc["ln1"]["bias"].reshape(L, 1, d),
      enc["qkv"]["kernel"], enc["qkv"]["bias"].reshape(L, 1, 3 * d),
      enc["out"]["kernel"], enc["out"]["bias"].reshape(L, 1, d),
      enc["ln2"]["scale"].reshape(L, 1, d), enc["ln2"]["bias"].reshape(L, 1, d),
      enc["fc1"]["kernel"], enc["fc1"]["bias"].reshape(L, 1, mlp),
      enc["fc2"]["kernel"], enc["fc2"]["bias"].reshape(L, 1, d),
      lnf["scale"].reshape(1, 1, d), lnf["bias"].reshape(1, 1, d))
    return out.reshape(b, sp, d)


# ----------------------------------------- int8 encoder stack (weight-only) --

def _encoder_stack_q_kernel(x_ref, g1_ref, bn1_ref, wqkv_ref, sqkv_ref,
                            bqkv_ref, wout_ref, sout_ref, bout_ref, g2_ref,
                            bn2_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                            b2_ref, o_ref, xcur_ref, qkv_ref, acc_ref, *,
                            eps: float, d: int, sp: int, num_heads: int,
                            head_dim: int, scale: float, seq_len: int,
                            b: int, nq: int, cq: int, nt: int,
                            num_layers: int, precision,
                            flat: bool = False):
    """:func:`_encoder_stack_kernel` with int8 weight tiles (weight-only
    quantization, vit_tpu/quant.py layout): every streamed weight arrives
    as int8 — HALF the bf16 weight traffic that sets the small-batch
    latency floor (docs/PERF.md §3) — is cast to the compute dtype
    on-core, and its fp32 per-output-channel scale is applied after the
    dot. Activations stay float; schedule and residency identical to the
    float kernel (incl. the opt-in ``flat`` 1-D grid)."""
    if flat:
        i = pl.program_id(0)
        T = nq + b + nt
        l, t = i // T, i % T
    else:
        l = pl.program_id(0)
        t = pl.program_id(1)
    f32 = jnp.float32

    def ln(rows, g_ref, b_ref):
        x32 = xcur_ref[rows, :].astype(f32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
        return ((xn * g_ref[0].astype(f32) + b_ref[0].astype(f32))
                .astype(xcur_ref.dtype))

    @pl.when((l == 0) & (t == 0))
    def _():
        xcur_ref[:] = x_ref[:]

    for j in range(nq):
        @pl.when(t == j)
        def _(j=j):
            start = j * cq
            xn = ln(slice(None), g1_ref, bn1_ref)
            z = jax.lax.dot_general(
                xn, wqkv_ref[0].astype(xn.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision)
            z = z * sqkv_ref[0, 0] + bqkv_ref[0, 0].astype(f32)
            z = z.astype(qkv_ref.dtype)
            for p in range(3):
                lo = max(start, p * d)
                hi = min(start + cq, (p + 1) * d)
                if lo < hi:
                    qkv_ref[p, :, lo - p * d:hi - p * d] = (
                        z[:, lo - start:hi - start])

    for g in range(b):
        @pl.when(t == nq + g)
        def _(g=g):
            rows = slice(g * sp, (g + 1) * sp)
            q_all = qkv_ref[0, rows, :]
            k_all = qkv_ref[1, rows, :]
            v_all = qkv_ref[2, rows, :]
            parts = []
            for h in range(num_heads):
                hs = slice(h * head_dim, (h + 1) * head_dim)
                s = jax.lax.dot_general(
                    q_all[:, hs], k_all[:, hs], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32, precision=precision) * scale
                if seq_len != sp:
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(col < seq_len, s, float("-inf"))
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                den = jnp.sum(p, axis=-1, keepdims=True)
                ctx = jax.lax.dot_general(
                    p.astype(v_all.dtype), v_all[:, hs],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=precision)
                parts.append(ctx / den)
            ctx_all = jnp.concatenate(parts, axis=1).astype(xcur_ref.dtype)
            out = jax.lax.dot_general(
                ctx_all, wout_ref[0].astype(ctx_all.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision)
            out = (out * sout_ref[0, 0] + bout_ref[0, 0].astype(f32)
                   + xcur_ref[rows, :].astype(f32))
            xcur_ref[rows, :] = out.astype(xcur_ref.dtype)

    for c in range(nt):
        @pl.when(t == nq + b + c)
        def _(c=c):
            if c == 0:
                acc_ref[:] = (xcur_ref[:].astype(f32)
                              + b2_ref[0].astype(f32))
            xn = ln(slice(None), g2_ref, bn2_ref)
            h = jax.lax.dot_general(
                xn, w1_ref[0].astype(xn.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision)
            h = h * s1_ref[0, 0]
            h = gelu(h + b1_ref[0, 0].astype(f32)).astype(xn.dtype)
            y = jax.lax.dot_general(
                h, w2_ref[0].astype(h.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision)
            acc_ref[:] += y * s2_ref[0, 0]
            if c == nt - 1:
                xcur_ref[:] = acc_ref[:].astype(xcur_ref.dtype)

                @pl.when(l == num_layers - 1)
                def _():
                    o_ref[:] = xcur_ref[:]


def encoder_stack_q(x: jax.Array, qenc: dict, *, num_heads: int,
                    scale: float | None = None, seq_len: int | None = None,
                    eps: float = 1e-12, interpret: bool = False) -> jax.Array:
    """Run the full encoder on int8-quantized weights in ONE Pallas kernel.

    ``qenc`` = scan-stacked encoder pytree from
    :func:`vit_tpu.quant.quantize_params`: each of qkv/out/fc1/fc2 has
    ``kernel = {"q": int8, "scale": fp32 per-output-channel}``. Same
    schedule as :func:`encoder_stack`, gated/planned by
    :func:`encoder_stack_plan_q`: tuned/forced plans are admitted under
    the true int8 footprint (``_stack_feasible(w_itemsize=1)`` — 1-byte
    weight windows + per-step cast-tile temps), which accepts plans the
    float model would veto; untuned geometries still resolve through the
    conservative float :func:`encoder_stack_plan`."""
    b, sp, d = x.shape
    L, _, three_d = qenc["qkv"]["kernel"]["q"].shape
    mlp = qenc["fc1"]["kernel"]["q"].shape[2]
    hd = d // num_heads
    assert three_d == 3 * d
    if scale is None:
        scale = hd ** -0.5
    if seq_len is None:
        seq_len = sp
    plan = encoder_stack_plan_q(b, sp, d, mlp, num_heads, x.dtype.itemsize)
    assert plan is not None, (b, sp, d, mlp, num_heads, x.dtype)
    cq, nq, mt, nt = plan["cq"], plan["nq"], plan["mt"], plan["nt"]
    flat = bool(plan.get("flat"))
    m = b * sp
    T = nq + b + nt
    grid, ix = _stack_grid(L, T, flat)

    kernel = functools.partial(
        _encoder_stack_q_kernel, eps=eps, d=d, sp=sp, num_heads=num_heads,
        head_dim=hd, scale=scale, seq_len=seq_len, b=b, nq=nq, cq=cq,
        nt=nt, num_layers=L, precision=_dot_precision(x.dtype), flat=flat)

    full = pl.BlockSpec((m, d), ix(lambda l, t: (0, 0)),
                        memory_space=pltpu.VMEM)
    lvec = lambda n: pl.BlockSpec((1, 1, n), ix(lambda l, t: (l, 0, 0)),
                                  memory_space=pltpu.VMEM)
    last_q, last_m = nq - 1, nt - 1
    qtile = lambda n: pl.BlockSpec(
        (1, 1, n), ix(lambda l, t: (l, 0, jnp.minimum(t, last_q))),
        memory_space=pltpu.VMEM)
    mtile = lambda n: pl.BlockSpec(
        (1, 1, n), ix(lambda l, t: (l, 0, jnp.clip(t - nq - b, 0, last_m))),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            full,                                               # x
            lvec(d), lvec(d),                                   # ln1
            pl.BlockSpec((1, d, cq),
                         ix(lambda l, t: (l, 0, jnp.minimum(t, last_q))),
                         memory_space=pltpu.VMEM),              # wqkv int8
            qtile(cq),                                          # sqkv tile
            qtile(cq),                                          # bqkv tile
            pl.BlockSpec((1, d, d), ix(lambda l, t: (l, 0, 0)),
                         memory_space=pltpu.VMEM),              # wout int8
            lvec(d),                                            # sout
            lvec(d),                                            # bout
            lvec(d), lvec(d),                                   # ln2
            pl.BlockSpec((1, d, mt),
                         ix(lambda l, t: (l, 0,
                                          jnp.clip(t - nq - b, 0, last_m))),
                         memory_space=pltpu.VMEM),              # w1 int8
            mtile(mt),                                          # s1 tile
            mtile(mt),                                          # b1 tile
            pl.BlockSpec((1, mt, d),
                         ix(lambda l, t: (l, jnp.clip(t - nq - b, 0, last_m),
                                          0)),
                         memory_space=pltpu.VMEM),              # w2 int8
            lvec(d),                                            # s2
            lvec(d),                                            # b2
        ],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((m, d), x.dtype),       # resident activation
            pltpu.VMEM((3, m, d), x.dtype),    # packed q/k/v
            pltpu.VMEM((m, d), jnp.float32),   # mlp accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            # Probe knob for the b>=3 scheduling-collapse bisect
            # (tools/encstack_probe.py); 28 MB is the measured-safe default.
            vmem_limit_bytes=int(os.environ.get(
                "VIT_TPU_STACK_VMEM_MB", "28")) * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=L * (2 * m * d * 4 * d + 4 * m * sp * d
                       + 4 * m * d * mlp),
            bytes_accessed=(2 * m * d * x.dtype.itemsize
                            + L * (4 * d * d + 2 * d * mlp)),
            transcendentals=L * m * (sp + mlp)),
        interpret=interpret,
    )(x.reshape(m, d),
      qenc["ln1"]["scale"].reshape(L, 1, d),
      qenc["ln1"]["bias"].reshape(L, 1, d),
      qenc["qkv"]["kernel"]["q"],
      qenc["qkv"]["kernel"]["scale"].reshape(L, 1, 3 * d),
      qenc["qkv"]["bias"].reshape(L, 1, 3 * d),
      qenc["out"]["kernel"]["q"],
      qenc["out"]["kernel"]["scale"].reshape(L, 1, d),
      qenc["out"]["bias"].reshape(L, 1, d),
      qenc["ln2"]["scale"].reshape(L, 1, d),
      qenc["ln2"]["bias"].reshape(L, 1, d),
      qenc["fc1"]["kernel"]["q"],
      qenc["fc1"]["kernel"]["scale"].reshape(L, 1, mlp),
      qenc["fc1"]["bias"].reshape(L, 1, mlp),
      qenc["fc2"]["kernel"]["q"],
      qenc["fc2"]["kernel"]["scale"].reshape(L, 1, d),
      qenc["fc2"]["bias"].reshape(L, 1, d))
    return out.reshape(b, sp, d)


if __name__ == "__main__":
    import argparse

    import numpy as np

    from vit_tpu.bench.artifacts import selftest
    from vit_tpu.ops import reference
    from vit_tpu.ops.dispatch import interpret_mode
    from vit_tpu.utils.timing import bench_chained

    ap = argparse.ArgumentParser(description="block kernels self-test + bench")
    ap.add_argument("-B", type=int, default=4)
    ap.add_argument("-S", type=int, default=208)
    ap.add_argument("--seq-len", type=int, default=197)
    ap.add_argument("-D", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--mlp", type=int, default=3072)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    B, S, D, M = args.B, args.S, args.D, args.mlp
    ip = interpret_mode()

    def arr(*shape, s=0.1):
        return jnp.asarray(rng.standard_normal(shape) * s, dt)

    x = arr(B, S, D, s=1.0)
    g1, be1 = arr(D, s=0.5) + 1, arr(D)
    w1, b1 = arr(D, M), arr(M)
    w2, b2 = arr(M, D), arr(D)

    def truth(fn, *xs):
        """fp32 ground truth + dtype-aware tolerance: at bf16 the composed
        XLA chain's own rounding error exceeds any fixed atol (measured
        max-err 0.29 on outputs of magnitude ~54), so the bar is relative
        to the output scale — same protocol either impl must clear."""
        want = fn(*(a.astype(jnp.float32) for a in xs))
        # 3e-2 relative for bf16: at D=1280 the composed bf16 XLA chain
        # itself lands 2.2% from fp32 truth (kernel: 2.1%), so 2e-2 would
        # flag the oracle. Real logic bugs produce O(1) relative errors.
        atol = (2e-3 if dt == jnp.float32
                else 3e-2 * float(jnp.abs(want).max()))
        return want, atol

    got = mlp_block(x, g1, be1, w1, b1, w2, b2, interpret=ip)
    want, atol = truth(
        lambda x, g1, be1, w1, b1, w2, b2: reference.matmul(
            reference.matmul(reference.layernorm(x, g1, be1, eps=1e-12),
                             w1, b1, "gelu"), w2, b2) + x,
        x, g1, be1, w1, b1, w2, b2)
    selftest("mlp_block", got.astype(jnp.float32), want, atol=atol)

    wqkv, bqkv = arr(D, 3 * D), arr(3 * D)
    wout, bout = arr(D, D), arr(D)
    hd = D // args.heads
    xa = jnp.asarray(rng.standard_normal((B, S, D)), dt)
    xa = xa.at[:, args.seq_len:].set(0)

    got = attn_block(xa, g1, be1, wqkv, bqkv, wout, bout,
                     num_heads=args.heads, seq_len=args.seq_len,
                     interpret=ip)

    def attn_ref(xa, g1, be1, wqkv, bqkv, wout, bout):
        xn = reference.layernorm(xa, g1, be1, eps=1e-12)
        qkv = reference.matmul(xn, wqkv, bqkv).reshape(
            B, S, 3, args.heads, hd)
        q, k, v = qkv.transpose(2, 0, 3, 1, 4)
        ctx = reference.attention(q, k, v, scale=hd ** -0.5,
                                  seq_len=args.seq_len)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, D)
        return reference.matmul(ctx, wout, bout) + xa

    want, atol = truth(attn_ref, xa, g1, be1, wqkv, bqkv, wout, bout)
    selftest("attn_block", got[:, :args.seq_len].astype(jnp.float32),
             want[:, :args.seq_len], atol=atol)

    if args.bench:
        def mk(fn, *xs):
            def step(c, *a):
                out = fn(a[0] * (1 + c * 1e-30).astype(dt), *a[1:])
                return jnp.mean(out).astype(jnp.float32)
            return bench_chained(step, args=xs)

        flops_mlp = 4 * B * S * D * M / 1e12
        ms = mk(lambda u: mlp_block(u, g1, be1, w1, b1, w2, b2), x)
        print(f"mlp_block:  {ms:.4f} ms  {flops_mlp / (ms / 1e3):.1f} TFLOP/s")
        flops_attn = (8 * B * S * D * D + 4 * B * S * S * D) / 1e12
        ms = mk(lambda u: attn_block(u, g1, be1, wqkv, bqkv, wout, bout,
                                     num_heads=args.heads,
                                     seq_len=args.seq_len), xa)
        print(f"attn_block: {ms:.4f} ms  {flops_attn / (ms / 1e3):.1f} TFLOP/s")
