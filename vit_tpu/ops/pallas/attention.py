"""Fused multi-head attention (flash) kernel.

The op the reference planned but never built (reference README.md:27 "Add
Flash attn — this should significantly improve the time"): its model runs
per-head ``matmul3 -> softmax -> matmul3`` with the (B,197,197) score matrix
round-tripping through HBM (reference vit/vit.py:66-72). This kernel fuses
the whole chain: scores are produced tile-by-tile in VMEM, reduced with the
online-softmax recurrence (running max ``m``, running normalizer ``l``,
unnormalized accumulator — the FlashAttention-2 formulation: normalize once
at the end), and only the (S, head_dim) context ever leaves the core.

Layout: (B, H, S, d) with batch*heads flattened (the reference serializes
heads in a Python loop, reference vit/vit.py:101-106; here they are just
more grid parallelism). Like the batched matmul3, the batch*heads axis
lives in the block *index arithmetic*, not the block shape: Q/K/V are
viewed as 2-D row matrices with each (batch, head) segment padded to a tile
boundary, so every block Mosaic sees is a plain 2-D tile. K/V are tiled
along a sequential grid axis, so sequence length is bounded by HBM, not
VMEM — this is what makes L/16-384 (577 tokens) and beyond run in O(block)
memory (SURVEY.md §5: the reference's softmax needs a whole row per SRAM
block).

Padded key columns are masked to -inf before the online update (exact —
they contribute exp(-inf)=0); padded query rows are sliced off after the
call. No attention mask / dropout, like the reference (TODO at
reference vit/vit.py:43).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.common import cdiv, round_up
from vit_tpu.ops.pallas.matmul import _dot_precision

_NEG_INF = float("-inf")


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale: float, seq_len: int, block_k: int, nk: int,
                  precision):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:]                       # (bq, d)
    k = k_ref[:]                       # (bk, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision) * scale

    # Mask padded key columns (global kv index >= seq_len) to -inf. Static
    # gate: only needed when the padded K extent exceeds the real length
    # (K/V rows are zero-padded in the launcher, so reads are defined).
    if nk * block_k != seq_len:
        col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < seq_len, s, _NEG_INF)

    m_prev, l_prev = m_ref[:], l_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)          # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                              # (bq, bk) fp32
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _flash_group_rows_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                             seq_len: int, sp: int, group: int, precision):
    """Single-tile path for sublane-ALIGNED S (the model's pre-padded
    contract): rows-view blocks, ``group`` head segments per grid step as a
    static unrolled loop. Measured faster than the batched-3D form on
    pre-padded operands (40.9 vs 37.3 TF/s at bh=384) — aligned 2-D tiles
    give Mosaic the cleanest layouts."""
    for g in range(group):
        q = q_ref[g * sp:(g + 1) * sp, :]
        k = k_ref[g * sp:(g + 1) * sp, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision) * scale
        if seq_len != sp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < seq_len, s, _NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[g * sp:(g + 1) * sp, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        o_ref[g * sp:(g + 1) * sp, :] = (ctx / l).astype(o_ref.dtype)


def _flash_group_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                        seq_len: int, precision):
    """Single-tile path for UNALIGNED S (raw operands, e.g. S=197 straight
    from the caller): the block is (group, S, d) — ``group`` (batch, head)
    segments per grid step, processed as ONE batched 3-D dot pair with the
    softmax vectorized across the group. S needs no alignment: Mosaic masks
    partial tiles internally, so unpadded operands run directly with no
    HBM pad copies (the round trip that cost the old rows-view ~20us at
    bh=96)."""
    q3 = q_ref[:]                       # (g, S, d)
    s = jax.lax.dot_general(q3, k_ref[:], (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=precision) * scale
    if seq_len != q3.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < seq_len, s, _NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    l = jnp.sum(p, axis=-1, keepdims=True)
    ctx = jax.lax.dot_general(p.astype(q3.dtype), v_ref[:],
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32,
                              precision=precision)
    o_ref[:] = (ctx / l).astype(o_ref.dtype)


def _flash_qtile_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                        seq_len: int, precision):
    """Mid-length path (768 < S, score tile fits VMEM): q is tiled, K/V are
    whole — with head_dim 64 an entire (S, d) K or V is tiny (0.26MB bf16 at
    S=2048), so there is no reason for online-softmax state or a K grid
    axis. One plain softmax over (bq, S) per step; ~4x fewer grid steps
    than the K-tiled online kernel (its ~1.5us/step pipeline bubbles were
    the entire loss at S=1024/2048)."""
    q = q_ref[0]                       # (bq, d)
    k = k_ref[0]                       # (S, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision) * scale
    if seq_len != k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < seq_len, s, _NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    l = jnp.sum(p, axis=-1, keepdims=True)
    ctx = jax.lax.dot_general(p.astype(q.dtype), v_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=precision)
    o_ref[0] = (ctx / l).astype(o_ref.dtype)


def _pick_group(bh: int, sp: int, d: int, dtype, op: str = "flash",
                budget: int = 8 * 2**20) -> int:
    """Heads per grid step: ``VIT_TPU_ATTN_GROUP`` env override -> persisted
    autotune table (vit_tpu/ops/pallas/tuning.py; op "flash" for the aligned
    rows-view path, "flash3d" for the unaligned batched-3D path — their
    optima differ) -> as many heads as divide B*H and fit the VMEM budget
    (4 streams double-buffered + fp32 score tile per head)."""
    import os
    override = os.environ.get("VIT_TPU_ATTN_GROUP")
    if override:
        return int(override)
    from vit_tpu.ops.pallas import tuning
    hit = tuning.lookup(op, dtype, (bh, sp, d))
    if hit is not None:
        g = min(int(hit["group"]), bh)
    else:
        itemsize = jnp.dtype(dtype).itemsize
        per_head = 4 * sp * d * itemsize * 2 + sp * sp * 4
        g = max(1, min(bh, budget // per_head, 16 if op == "flash" else 8))
    while bh % g:
        g -= 1
    return g


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: float | None = None,
                    seq_len: int | None = None,
                    block_q: int = 256, block_k: int = 256,
                    force_online: bool = False,
                    interpret: bool = False) -> jax.Array:
    """Softmax(q @ k^T * scale) @ v for (B, H, S, d) operands.

    ``seq_len``: the number of REAL tokens when the operands arrive already
    zero-padded along S (the model pads the whole encoder to a sublane
    multiple so this kernel's rows view is a free reshape — see
    vit_tpu/models/vit.py). Keys past ``seq_len`` are masked to -inf;
    queries past it produce garbage rows the caller slices off.

    Two regimes:
    - single-tile (every ViT variant up to L/16-384): the whole padded
      sequence is one K tile per head, plain softmax, multiple heads per
      grid step (:func:`_flash_group_kernel`). S pads to a *sublane*
      multiple (16), not a lane multiple — 197 -> 208, not 256: the MXU
      rounds to 128 lanes internally either way, but HBM traffic follows
      the stored shape.
    - longer sequences: blockwise online-softmax recurrence
      (:func:`_flash_kernel`), O(block) memory.
    """
    assert q.shape == k.shape == v.shape, (q.shape, k.shape, v.shape)
    b, h, s, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if seq_len is None:
        seq_len = s
    assert seq_len <= s, (seq_len, s)

    sp_min = round_up(s, 16)
    bh = b * h
    if sp_min <= max(block_q, 768):
        # Single-tile regime: the whole sequence is one K tile (the fp32
        # score tile for 768 rows is 2.3MB, well within VMEM). Two layouts:
        # sublane-aligned S (the model's pre-padded contract) takes the
        # rows-view unrolled kernel; unaligned S (raw operands) takes 3-D
        # blocks with NO padding — Mosaic masks the partial tiles
        # internally, so S=197 costs no HBM pad copies.
        if s == sp_min:
            sp = s
            group = _pick_group(bh, sp, d, q.dtype, op="flash")
            kernel = functools.partial(_flash_group_rows_kernel, scale=scale,
                                       seq_len=seq_len, sp=sp, group=group,
                                       precision=_dot_precision(q.dtype))
            spec = pl.BlockSpec((group * sp, d), lambda g: (g, 0),
                                memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((bh * sp, d), q.dtype)
            operands = [x.reshape(bh * sp, d) for x in (q, k, v)]
        else:
            group = _pick_group(bh, sp_min, d, q.dtype, op="flash3d")
            kernel = functools.partial(_flash_group_kernel, scale=scale,
                                       seq_len=seq_len,
                                       precision=_dot_precision(q.dtype))
            spec = pl.BlockSpec((group, s, d), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((bh, s, d), q.dtype)
            operands = [x.reshape(bh, s, d) for x in (q, k, v)]
        out = pl.pallas_call(
            kernel,
            grid=(bh // group,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s * s * d,
                bytes_accessed=4 * b * h * s * d * q.dtype.itemsize,
                transcendentals=b * h * s * s),
            interpret=interpret,
        )(*operands)
        return out.reshape(b, h, s, d)

    # Mid-length regime: q tiled, K/V whole (no online state) while the
    # (bq, S) fp32 score tile stays within ~8MB. 3-D blocks, no padding.
    bq = block_q
    while bq * sp_min * 4 > 8 * 2**20 and bq > 128:
        bq //= 2
    if (sp_min * d * q.dtype.itemsize <= 2**20 and bq >= 128
            and not force_online):
        qb = cdiv(s, bq)
        kernel = functools.partial(_flash_qtile_kernel, scale=scale,
                                   seq_len=seq_len,
                                   precision=_dot_precision(q.dtype))
        qspec = pl.BlockSpec((1, bq, d), lambda g, qi: (g, qi, 0),
                             memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((1, s, d), lambda g, qi: (g, 0, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(bh, qb),
            in_specs=[qspec, kspec, kspec],
            out_specs=qspec,
            out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s * s * d,
                bytes_accessed=4 * b * h * s * d * q.dtype.itemsize,
                transcendentals=b * h * s * s),
            interpret=interpret,
        )(q.reshape(bh, s, d), k.reshape(bh, s, d), v.reshape(bh, s, d))
        return out.reshape(b, h, s, d)

    bq = min(block_q, sp_min)
    bk = min(block_k, sp_min)
    sq, sk = round_up(s, bq), round_up(s, bk)

    def rows(x, sp):  # (B,H,S,d) -> (B*H*Sp, d), zero-padded per segment
        x = x.reshape(bh, s, d)
        if sp != s:
            x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
        return x.reshape(bh * sp, d)

    qf, kf, vf = rows(q, sq), rows(k, sk), rows(v, sk)

    qb, kb = sq // bq, sk // bk  # tiles per (batch, head) segment
    nk = kb

    kernel = functools.partial(_flash_kernel, scale=scale, seq_len=seq_len,
                               block_k=bk, nk=nk,
                               precision=_dot_precision(q.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(bh, qb, nk),
        in_specs=[
            pl.BlockSpec((bq, d), lambda g, qi, ki: (g * qb + qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, d), lambda g, qi, ki: (g * kb + ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, d), lambda g, qi, ki: (g * kb + ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, d), lambda g, qi, ki: (g * qb + qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh * sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),   # running max m
            pltpu.VMEM((bq, 1), jnp.float32),   # running normalizer l
            pltpu.VMEM((bq, d), jnp.float32),   # unnormalized accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=4 * b * h * s * d * q.dtype.itemsize,
            transcendentals=b * h * s * s),
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(bh, sq, d)
    if sq != s:
        out = out[:, :s]
    return out.reshape(b, h, s, d)


if __name__ == "__main__":
    import argparse

    import numpy as np

    from vit_tpu.bench.artifacts import selftest, write_perf_report
    from vit_tpu.ops import reference
    from vit_tpu.ops.dispatch import interpret_mode
    from vit_tpu.utils.timing import bench_chained

    ap = argparse.ArgumentParser(description="flash attention self-test + bench")
    ap.add_argument("-B", type=int, default=8)
    ap.add_argument("-H", type=int, default=12)
    ap.add_argument("-S", type=int, default=197)
    ap.add_argument("-d", type=int, default=64)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    shape = (args.B, args.H, args.S, args.d)
    q = jnp.asarray(rng.standard_normal(shape), dt)
    k = jnp.asarray(rng.standard_normal(shape), dt)
    v = jnp.asarray(rng.standard_normal(shape), dt)
    got = flash_attention(q, k, v, interpret=interpret_mode())
    want = reference.attention(q, k, v)
    selftest("flash_attention", got, want,
             atol=2e-5 if dt == jnp.float32 else 2e-2)

    if args.bench:
        def xla_chain(q, k, v):
            """The reference's attention op chain, batched over heads:
            matmul3(q, k^T, scaled) -> softmax -> matmul3 (reference
            vit/vit.py:66-72) — the formulation the model's XLA path uses
            and the baseline VERDICT holds this kernel to."""
            b, h, s, hd = q.shape
            qf = q.reshape(b * h, s, hd)
            kf = k.reshape(b * h, s, hd)
            vf = v.reshape(b * h, s, hd)
            sc = reference.matmul3(qf, kf.transpose(0, 2, 1),
                                   scale=hd ** -0.5)
            pr = reference.softmax(sc)
            return reference.matmul3(pr, vf).reshape(q.shape)

        rows = []
        for s in [197, 257, 577, 1024, 2048]:
            sh = (args.B, args.H, s, args.d)
            qq = jnp.asarray(rng.standard_normal(sh), dt)
            kk = jnp.asarray(rng.standard_normal(sh), dt)
            vv = jnp.asarray(rng.standard_normal(sh), dt)

            def mk(fn):
                # Operands as jit ARGUMENTS, not closure constants — closure
                # capture inflates the tunneled measurement ~1.7x.
                def step(c, q, k, v):
                    out = fn(q * (1 + c * 1e-30).astype(dt), k, v)
                    return jnp.mean(out).astype(jnp.float32)
                return step

            pal = bench_chained(mk(lambda a, b2, c2: flash_attention(a, b2, c2)),
                                args=(qq, kk, vv))
            xla = bench_chained(mk(xla_chain), args=(qq, kk, vv))
            ein = bench_chained(mk(reference.attention), args=(qq, kk, vv))
            tflops = 4 * args.B * args.H * s * s * args.d / 1e12
            rows.append({"S": s, "pallas_ms": pal, "xla_ms": xla,
                         "xla_einsum_ms": ein,
                         "pallas_tflops": tflops / (pal / 1e3),
                         "xla_tflops": tflops / (xla / 1e3),
                         "xla_einsum_tflops": tflops / (ein / 1e3)})
            print(rows[-1])
        write_perf_report("flash_attention", rows, x_key="S",
                          y_keys=["pallas_tflops", "xla_tflops",
                                  "xla_einsum_tflops"],
                          y_label="TFLOP/s")
