"""Image -> patch-row rearrangement kernel (unfold).

TPU-native equivalent of reference vit/kernels/patching.py:7-105:
``(B, C, H, W) -> (B, (H/P)(W/P), C*P*P)`` with per-patch element order
(channel, row, col). The reference hardcodes C=3 with separate R/G/B loads
(reference patching.py:37-39); here channels are generic.

Formulation notes (Mosaic-lowering constraints drove this design):

- The W -> (Wp, P) lane split is done OUTSIDE the kernel as a free
  contiguous reshape, so the kernel's input is a 2-D row matrix whose rows
  are (patch_row_in_image r, patch_col j) pairs and whose lanes are the
  P in-patch columns. Lane-splitting reshapes inside a kernel are an
  unsupported Mosaic shape cast on v5e.
- The kernel is then a pure row-gather: P static row-slice copies, each
  writing one in-patch row r of all Wp patches into the output stripe's
  lanes [r*P, (r+1)*P). No reshape or transpose touches the lane dim.
- Output rows are padded per patch-row group to a sublane multiple
  (Mosaic requires block rows % 8 == 0) and sliced off afterwards.

Note this op is pure data movement — in the model path the unfold is left
to XLA (vit_tpu/ops/reference.py:patchify) and fused into the embedding
matmul's operand stream (see vit_tpu/ops/pallas/patch_embed.py); this
standalone kernel mirrors the reference's library surface, where it is
likewise exported but unused by the model (no call sites in reference
vit/vit.py — SURVEY.md §2.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.common import round_up


def _patching_kernel(x_ref, o_ref, *, patch: int, wp: int, wp_pad: int):
    # x_ref: (P*Wp, P) — row (r*Wp + j) holds in-patch row r of patch j.
    # o_ref: (wp_pad, P*P) — row j is patch j's flattened (r, s) elements.
    for r in range(patch):
        o_ref[0:wp, r * patch:(r + 1) * patch] = \
            x_ref[r * wp:(r + 1) * wp, :]
    if wp_pad != wp:
        o_ref[wp:wp_pad, :] = jnp.zeros((wp_pad - wp, patch * patch),
                                        o_ref.dtype)


def patchify(x: jax.Array, patch_size: int, *,
             interpret: bool = False) -> jax.Array:
    """``(B, C, H, W) -> (B, N, C*P*P)``, N = (H/P)*(W/P)."""
    b, c, h, w = x.shape
    p = patch_size
    assert h % p == 0 and w % p == 0, (x.shape, p)
    hp, wp = h // p, w // p
    n = hp * wp
    wp_pad = round_up(wp, 8)

    # Free reshapes only: (B,C,H,W) -> (B,C,Hp,P,Wp,P) -> row matrix.
    x2 = x.reshape(b * c * hp, p * wp, p).reshape(b * c * hp * p * wp, p)

    kernel = functools.partial(_patching_kernel, patch=p, wp=wp,
                               wp_pad=wp_pad)
    out = pl.pallas_call(
        kernel,
        grid=(b, c, hp),
        in_specs=[pl.BlockSpec(
            (p * wp, p), lambda bb, cc, i: ((bb * c + cc) * hp + i, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (wp_pad, p * p), lambda bb, cc, i: (bb * hp + i, cc),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * hp * wp_pad, c * p * p), x.dtype),
        interpret=interpret,
    )(x2)
    out = out.reshape(b, hp, wp_pad, c * p * p)
    if wp_pad != wp:
        out = out[:, :, :wp]
    return out.reshape(b, n, c * p * p)


if __name__ == "__main__":
    import argparse

    import numpy as np

    from vit_tpu.bench.artifacts import selftest
    from vit_tpu.ops import reference
    from vit_tpu.ops.dispatch import interpret_mode

    ap = argparse.ArgumentParser(description="patching self-test")
    ap.add_argument("-B", type=int, default=2)
    ap.add_argument("-H", type=int, default=224)
    ap.add_argument("-P", type=int, default=16)
    ap.add_argument("-C", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.B, args.C, args.H, args.H)), dt)
    got = patchify(x, args.P, interpret=interpret_mode())
    # Reference tolerance: patching atol=1e-2 (reference patching.py:108-136);
    # ours is exact — it's a pure data-movement op.
    selftest("patching", got, reference.patchify(x, args.P), atol=0.0)
