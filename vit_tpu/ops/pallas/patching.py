"""Image -> patch-row rearrangement kernel (unfold).

TPU-native equivalent of reference vit/kernels/patching.py:7-105:
``(B, C, H, W) -> (B, (H/P)(W/P), C*P*P)`` with per-patch element order
(channel, row, col). The reference hardcodes C=3 with separate R/G/B loads
(reference patching.py:37-39); here channels are generic.

Formulation: both arrays are viewed as 2-D (images as scanline rows, output
as patch rows) and the grid walks (batch, channel, patch-row); each program
reads the (P, W) scanline slab of one patch-row/channel and writes the
(Wp, P*P) column stripe of the corresponding output rows — a blocked
transpose done in VMEM. All blocks are plain 2-D tiles.

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


def _patching_kernel(x_ref, o_ref, *, patch: int):
    p, w = x_ref.shape
    wp = w // patch
    r = x_ref[:]                          # (P, W) scanline slab
    r = r.reshape(p, wp, patch)           # split W into patches
    r = r.transpose(1, 0, 2)              # (Wp, P, P)
    o_ref[:] = r.reshape(wp, p * patch)


def patchify(x: jax.Array, patch_size: int, *,
             interpret: bool = False) -> jax.Array:
    """``(B, C, H, W) -> (B, N, C*P*P)``, N = (H/P)*(W/P)."""
    b, c, h, w = x.shape
    p = patch_size
    assert h % p == 0 and w % p == 0, (x.shape, p)
    hp, wp = h // p, w // p
    n = hp * wp

    x2d = x.reshape(b * c * hp * p, w)     # scanline rows (free reshape)

    kernel = functools.partial(_patching_kernel, patch=p)
    out = pl.pallas_call(
        kernel,
        grid=(b, c, hp),
        in_specs=[pl.BlockSpec(
            (p, w), lambda bb, cc, i: ((bb * c + cc) * hp + i, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (wp, p * p), lambda bb, cc, i: (bb * hp + i, cc),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n, c * p * p), x.dtype),
        interpret=interpret,
    )(x2d)
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
