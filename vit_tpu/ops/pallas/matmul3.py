"""Both-operands-batched matmul kernel: ``(B,M,K) @ (B,K,N)`` with fused
scalar scaling.

TPU-native equivalent of reference vit/kernels/matmul3.py:40-156 (the
attention-score/context matmul with fused ``1/sqrt(d)`` scaling at
matmul3.py:105-106). Same K-sequential fp32-accumulator pipeline as the
linear matmul, with the batch axis folded into the *block index arithmetic*
rather than the block shape: operands are viewed as 2-D row matrices
(batch-padded so every batch starts on a block boundary) and the index maps
pick each batch's tile — all blocks stay 2-D, which is what Mosaic tiles
(and compiles) best on v5e.

Note: in the production model path this kernel only serves the
``attention='unfused'`` parity mode — the flash-attention kernel
(vit_tpu/ops/pallas/attention.py) fuses the whole score->softmax->context
chain and never materializes (B,197,197) scores in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.common import cdiv, pad_dim, round_up
from vit_tpu.ops.pallas.matmul import _dot_precision, _pick_blocks


def _matmul3_kernel(x_ref, y_ref, o_ref, acc_ref, *, nk: int,
                    scale: float | None, precision):
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], y_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(k == nk - 1)
    def _():
        r = acc_ref[:]
        if scale is not None:
            r = r * scale
        o_ref[:] = r.astype(o_ref.dtype)


def _matmul3_group_kernel(x_ref, y_ref, o_ref, *, group: int, mp: int,
                          kp: int, scale: float | None, precision):
    """Small-per-batch fast path: each batch's whole matmul is one tile, and
    ``group`` batches are processed per grid step (static unrolled loop) to
    amortize the TPU's per-grid-step pipeline setup — attention-shaped
    calls (e.g. (B*H, 197, 64)@(B*H, 64, 197)) are otherwise step-bound."""
    for g in range(group):
        r = jax.lax.dot_general(
            x_ref[g * mp:(g + 1) * mp, :], y_ref[g * kp:(g + 1) * kp, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        if scale is not None:
            r = r * scale
        o_ref[g * mp:(g + 1) * mp, :] = r.astype(o_ref.dtype)


def matmul3(x: jax.Array, y: jax.Array, *, scale: float | None = None,
            interpret: bool = False) -> jax.Array:
    """``(x @ y) * scale`` for x (B,M,K), y (B,K,N)."""
    assert x.ndim == y.ndim == 3 and x.shape[0] == y.shape[0], (x.shape, y.shape)
    assert x.shape[-1] == y.shape[-2], (x.shape, y.shape)
    b, m, k = x.shape
    n = y.shape[-1]

    kp = round_up(k, 128)
    bm, bn, bk = _pick_blocks(m, n, kp, x.dtype.itemsize)
    assert kp % bk == 0, (kp, bk)  # K edges must never be partial
    nk = kp // bk

    # Pad M and K to block multiples, then flatten batch into rows: every
    # batch starts on a block boundary, so 2-D index arithmetic addresses
    # each batch's tiles exactly (zero-padded K contributes nothing).
    mp = round_up(m, bm)
    xp = jnp.pad(x, ((0, 0), (0, mp - m), (0, kp - k))).reshape(b * mp, kp)
    yp, _ = pad_dim(y, 1, bk)
    yp = yp.reshape(b * kp, n)
    mb, kb = mp // bm, kp // bk  # blocks per batch along M / K

    if mb == 1 and nk == 1 and n <= bn:
        # Whole per-batch product fits one tile: group batches per step.
        it = x.dtype.itemsize
        per_b = ((mp * kp + kp * n + mp * n) * it) * 2 + mp * n * 4
        # bf16 affords the same ~10MB live-VMEM region the matmul tuner
        # proved safe on v5e; fp32 keeps the conservative cap (compile-hang
        # risk near the ceiling). At S=512 this lifts group 1 -> 3 and the
        # step-bound sweep rows with it (PERF.md 4b).
        cap = (10 * 2**20) if it <= 2 else (4 * 2**20)
        group = max(1, min(b, cap // max(per_b, 1), 16))
        while b % group:
            group -= 1
        kernel = functools.partial(
            _matmul3_group_kernel, group=group, mp=mp, kp=kp, scale=scale,
            precision=_dot_precision(x.dtype))
        out = pl.pallas_call(
            kernel,
            grid=(b // group,),
            in_specs=[
                pl.BlockSpec((group * mp, kp), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group * kp, n), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((group * mp, n), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * mp, n), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * m * n * kp,
                bytes_accessed=b * (m * kp + kp * n + m * n) * it,
                transcendentals=0),
            interpret=interpret,
        )(xp, yp)
        out = out.reshape(b, mp, n)
        return out[:, :m] if mp != m else out

    kernel = functools.partial(_matmul3_kernel, nk=nk, scale=scale,
                               precision=_dot_precision(x.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(b, mb, cdiv(n, bn), nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda bb, i, j, kk: (bb * mb + i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda bb, i, j, kk: (bb * kb + kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda bb, i, j, kk: (bb * mb + i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * mp, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m * n * kp,
            bytes_accessed=b * (m * kp + kp * n + m * n) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xp, yp)
    out = out.reshape(b, mp, n)
    return out[:, :m] if mp != m else out


if __name__ == "__main__":
    import argparse

    import numpy as np

    from vit_tpu.bench.artifacts import selftest, write_perf_report
    from vit_tpu.ops import reference
    from vit_tpu.ops.dispatch import interpret_mode
    from vit_tpu.utils.timing import bench_chained

    ap = argparse.ArgumentParser(description="matmul3 self-test + bench")
    ap.add_argument("-B", type=int, default=48)   # B*H for B/16 @ bs=4
    ap.add_argument("-M", type=int, default=197)
    ap.add_argument("-K", type=int, default=64)
    ap.add_argument("-N", type=int, default=197)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.B, args.M, args.K)) * 0.3, dt)
    y = jnp.asarray(rng.standard_normal((args.B, args.K, args.N)) * 0.3, dt)
    ip = interpret_mode()
    # Reference tolerance: matmul3 atol=1e-2 rtol=0 (reference matmul3.py:159-196).
    atol = 1e-3 if dt == jnp.float32 else 5e-2
    selftest("matmul3", matmul3(x, y, interpret=ip),
             reference.matmul3(x, y), atol=atol)
    selftest("matmul3+scale", matmul3(x, y, scale=0.125, interpret=ip),
             reference.matmul3(x, y, scale=0.125), atol=atol)

    if args.bench:
        rows = []
        for s in [128, 197, 256, 512, 577]:
            a = jnp.asarray(rng.standard_normal((args.B, s, 64)) * 0.3, dt)
            bb = jnp.asarray(rng.standard_normal((args.B, 64, s)) * 0.3, dt)

            # Operands as jit ARGUMENTS, not closure constants (closure
            # capture inflates tunneled measurements ~1.7x).
            def mk(fn):
                def step(c, a, bb):
                    out = fn(a * (1 + c * 1e-30).astype(dt), bb)
                    return jnp.mean(out).astype(jnp.float32)
                return step

            pal = bench_chained(mk(lambda u, v: matmul3(u, v, scale=0.125)), args=(a, bb))
            xla = bench_chained(mk(lambda u, v: reference.matmul3(u, v, scale=0.125)), args=(a, bb))
            tflops = 2 * args.B * s * s * 64 / 1e12
            rows.append({"S": s, "pallas_ms": pal, "xla_ms": xla,
                         "pallas_tflops": tflops / (pal / 1e3),
                         "xla_tflops": tflops / (xla / 1e3)})
            print(rows[-1])
        write_perf_report("matmul3", rows, x_key="S",
                          y_keys=["pallas_tflops", "xla_tflops"],
                          y_label="TFLOP/s")
