"""Patch-embedding "convolution" as unfold + fused matmul.

TPU-native replacement for reference vit/kernels/conv2d.py:19-167 — the
reference's slowest kernel by far (a scalar loop over output columns and
channels with no tensor-core use; its own benchmarks show 5-20 GB/s vs
torch's 40-85, SURVEY.md §6, and its roadmap targets exactly this
unfold+matmul rewrite, reference README.md:26).

The unfold is a pure layout transformation left to XLA (it fuses the
transpose into the matmul operand stream); the projection itself is the
Pallas fused-linear matmul, putting all patch-embed FLOPs on the MXU. For
ViT-B/16 at 224px this is a (B*196, 768) @ (768, 768) matmul — MXU-shaped
by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.common import pad_dim
from vit_tpu.ops.pallas.matmul import _dot_precision, matmul
from vit_tpu.ops.reference import patchify as _patchify_xla


def patch_embed(x: jax.Array, w: jax.Array, bias: jax.Array | None,
                patch_size: int, *, interpret: bool = False) -> jax.Array:
    """(B, C, H, W) images -> (B, N, D) patch embeddings.

    ``w``: (C*P*P, D) — the HF conv weight (D, C, P, P) flattened in
    (channel, kh, kw) order and transposed (see vit_tpu/weights/hf.py).
    """
    patches = _patchify_xla(x, patch_size)
    if not interpret:
        # Without a barrier XLA fuses upstream elementwise work into the
        # patchify transpose and hands the pallas call a pathologically-
        # laid-out operand (measured 0.373 vs 0.142 ms at B=32 bf16 on
        # v5e); the barrier pins a clean materialization point.
        patches = jax.lax.optimization_barrier(patches)
    return matmul(patches, w, bias, interpret=interpret)


def _embed_kernel(p_ref, w_ref, b_ref, base_ref, o_ref, *, n, sp,
                  precision):
    # p_ref: (1, n, kp) one image's patch rows; w_ref: (kp, d);
    # b_ref: (1, d) conv bias; base_ref: (sp, d) precomputed
    # [cls+pos0; pos[1:n+1]; 0] rows; o_ref: (1, sp, d).
    dt = o_ref.dtype
    d = w_ref.shape[1]
    z = jax.lax.dot_general(
        p_ref[0], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    # Match the composed path's rounding: fp32 matmul+bias, cast to model
    # dtype, THEN add position embeddings in model dtype (the XLA path's
    # `x + pos` is a bf16 add after the matmul's cast).
    z = (z + b_ref[:].astype(jnp.float32)).astype(dt)
    zp = jnp.concatenate(
        [jnp.zeros((1, d), dt), z, jnp.zeros((sp - 1 - n, d), dt)], axis=0)
    o_ref[0] = zp + base_ref[:]


def embed_fused(patches: jax.Array, w: jax.Array, bias: jax.Array,
                cls_row: jax.Array, pos: jax.Array, sp: int, *,
                interpret: bool = False) -> jax.Array:
    """Patch projection + CLS row + position add + pad-to-``sp``, fused.

    One Pallas pass replaces the reference's conv2d -> flatten/transpose ->
    cls cat -> pos broadcast-add chain (reference vit/vit.py:188-200) AND
    the model's sublane pad: the kernel computes the (N, D) projection on
    the MXU and assembles the padded (sp, D) token matrix in VMEM, so the
    unpadded embedding never exists in HBM.

    ``patches``: (B, N, K) unfolded images; ``w``: (K, D); ``bias``: (D,);
    ``cls_row``: (D,) already including pos[0]; ``pos``: (N, D) position
    rows for the patch tokens (HF pos[1:N+1]). Returns (B, sp, D) with
    rows N+1.. zero.
    """
    b, n, k = patches.shape
    d = w.shape[1]
    assert sp >= n + 1 and d % 128 == 0, (sp, n, d)
    patches, _ = pad_dim(patches, 2, 128)
    wp, _ = pad_dim(w, 0, 128)
    kp = patches.shape[2]
    dt = patches.dtype

    base = jnp.concatenate(
        [cls_row.reshape(1, d).astype(dt), pos.astype(dt),
         jnp.zeros((sp - 1 - n, d), dt)], axis=0)

    kernel = functools.partial(_embed_kernel, n=n, sp=sp,
                               precision=_dot_precision(dt))
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sp, d), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(patches, wp, bias.reshape(1, d).astype(dt), base)
    return out


if __name__ == "__main__":
    import argparse

    import numpy as np

    import jax.numpy as jnp
    from vit_tpu.bench.artifacts import selftest, write_perf_report
    from vit_tpu.ops import reference
    from vit_tpu.ops.dispatch import interpret_mode
    from vit_tpu.utils.timing import bench_chained

    ap = argparse.ArgumentParser(description="patch_embed self-test + bench")
    ap.add_argument("-B", type=int, default=2)
    ap.add_argument("-H", type=int, default=224)
    ap.add_argument("-P", type=int, default=16)
    ap.add_argument("-D", type=int, default=768)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    c = 3
    x = jnp.asarray(rng.standard_normal((args.B, c, args.H, args.H)), dt)
    w = jnp.asarray(rng.standard_normal((c * args.P ** 2, args.D)) * 0.05, dt)
    b = jnp.asarray(rng.standard_normal(args.D) * 0.05, dt)
    got = patch_embed(x, w, b, args.P, interpret=interpret_mode())
    want = reference.patch_embed(x, w, b, args.P)
    selftest("patch_embed", got, want,
             atol=1e-3 if dt == jnp.float32 else 5e-2)

    if args.bench:
        rows = []
        for bsz in [1, 8, 32, 64]:
            xx = jnp.asarray(rng.standard_normal((bsz, c, args.H, args.H)), dt)

            # Operands as jit ARGUMENTS, not closure constants (closure
            # capture inflates tunneled measurements ~1.7x).
            def mk(fn):
                def step(cc, xx, w, b):
                    out = fn(xx * (1 + cc * 1e-30).astype(dt), w, b, args.P)
                    return jnp.mean(out).astype(jnp.float32)
                return step

            pal = bench_chained(mk(lambda u, ww, bb2, p: patch_embed(u, ww, bb2, p)), args=(xx, w, b))
            xla = bench_chained(mk(reference.patch_embed), args=(xx, w, b))
            n = (args.H // args.P) ** 2
            gb = (bsz * n * (c * args.P ** 2 + args.D) * dt.itemsize) / 1e9
            rows.append({"B": bsz, "pallas_ms": pal, "xla_ms": xla,
                         "pallas_gbps": gb / (pal / 1e3),
                         "xla_gbps": gb / (xla / 1e3)})
            print(rows[-1])
        write_perf_report("patch_embed", rows, x_key="B",
                          y_keys=["pallas_gbps", "xla_gbps"], y_label="GB/s")
