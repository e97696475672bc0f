"""Row layernorm kernel.

TPU-native equivalent of reference vit/kernels/layernorm.py:28-142. Same
numerics (biased variance, eps inside the sqrt, matching ``F.layer_norm`` —
reference layernorm.py:72-73) but single-pass in VMEM instead of the
reference's 3-pass block loop (its row length exceeded one Triton block;
here a (rows, D) tile sits in VMEM and the VPU reduces D in registers), and
one program per *row-block* instead of per row (reference grid (B, N) at
layernorm.py:112 — 197-row grids would underutilize a TPU core).

Statistics are computed in fp32 regardless of input dtype. Each block spans
the full row width, so reductions see the logical (unpadded) D — no lane
masking needed; only grid-edge *row* blocks read padding, and those rows are
discarded by Pallas' masked stores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.common import as_rows, cdiv, pick_row_block, round_up


def _layernorm_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float, d: int):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.sum(x, axis=-1, keepdims=True) / d
    cx = x - mean
    var = jnp.sum(cx * cx, axis=-1, keepdims=True) / d
    normed = cx * jax.lax.rsqrt(var + eps)
    out = normed * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _stats_kernel(x_ref, mu_ref, rs_ref, *, eps: float, d: int):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.sum(x, axis=-1, keepdims=True) / d
    cx = x - mean
    var = jnp.sum(cx * cx, axis=-1, keepdims=True) / d
    mu_ref[:] = mean
    rs_ref[:] = jax.lax.rsqrt(var + eps)


def layernorm_stats(x: jax.Array, *, eps: float = 1e-12,
                    interpret: bool = False):
    """Row mean and reciprocal-std of ``(..., D)`` -> two ``(M, 1)`` fp32
    arrays (rows flattened). The first half of a layernorm, split out so the
    normalization itself can fuse into a following matmul's prologue
    (vit_tpu/ops/pallas/matmul.py:fused_linear)."""
    xf, _ = as_rows(x)
    m, d = xf.shape
    bm = pick_row_block(m, round_up(d, 128) * 4, dtype=x.dtype)
    kernel = functools.partial(_stats_kernel, eps=eps, d=d)
    return pl.pallas_call(
        kernel,
        grid=(cdiv(m, bm),),
        in_specs=[pl.BlockSpec((bm, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((bm, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((m, 1), jnp.float32)] * 2,
        interpret=interpret,
    )(xf)


def layernorm(x: jax.Array, scale: jax.Array, bias: jax.Array, *,
              eps: float = 1e-12, interpret: bool = False) -> jax.Array:
    """Layernorm over the last dim of ``(..., D)``; scale/bias shape (D,)."""
    assert scale.shape == bias.shape == x.shape[-1:], (x.shape, scale.shape)
    xf, restore = as_rows(x)
    m, d = xf.shape
    d_pad = round_up(d, 128)  # physical lane footprint, for block sizing only
    bm = pick_row_block(m, d_pad * 4, dtype=x.dtype)

    kernel = functools.partial(_layernorm_kernel, eps=eps, d=d)
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(m, bm),),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        interpret=interpret,
    )(xf, scale.reshape(1, d), bias.reshape(1, d))
    return restore(out)


if __name__ == "__main__":
    import argparse

    import numpy as np

    from vit_tpu.bench.artifacts import selftest, write_perf_report
    from vit_tpu.ops import reference
    from vit_tpu.ops.dispatch import interpret_mode
    from vit_tpu.utils.timing import bench_chained

    ap = argparse.ArgumentParser(description="layernorm self-test + bench")
    ap.add_argument("-B", type=int, default=4)
    ap.add_argument("-N", type=int, default=197)
    ap.add_argument("-D", type=int, default=768)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.B, args.N, args.D)), dt)
    s = jnp.asarray(rng.standard_normal(args.D), dt)
    b = jnp.asarray(rng.standard_normal(args.D), dt)
    got = layernorm(x, s, b, eps=1e-12, interpret=interpret_mode())
    want = reference.layernorm(x, s, b, eps=1e-12)
    # Reference tolerance: layernorm 1e-6 (reference layernorm.py:144-170).
    selftest("layernorm", got, want,
             atol=1e-5 if dt == jnp.float32 else 2e-2)

    if args.bench:
        rows = []
        for n in [256, 512, 1024, 2048, 3840]:
            a = jnp.asarray(rng.standard_normal((args.B, n, args.D)), dt)

            # Operands as jit ARGUMENTS, not closure constants (closure
            # capture inflates tunneled measurements ~1.7x).
            def mk(fn):
                def step(c, a, s, b):
                    out = fn(a * (1 + c * 1e-30).astype(dt), s, b)
                    return jnp.mean(out).astype(jnp.float32)
                return step

            pal = bench_chained(mk(lambda u, s2, b2: layernorm(u, s2, b2)), lengths=(100, 2100), args=(a, s, b))
            xla = bench_chained(mk(reference.layernorm), lengths=(100, 2100), args=(a, s, b))
            gbps = 2 * args.B * n * args.D * dt.itemsize / 1e9
            rows.append({"N": n, "pallas_ms": pal, "xla_ms": xla,
                         "pallas_gbps": gbps / (pal / 1e3),
                         "xla_gbps": gbps / (xla / 1e3)})
            print(rows[-1])
        write_perf_report("layernorm", rows, x_key="N",
                          y_keys=["pallas_gbps", "xla_gbps"], y_label="GB/s")
