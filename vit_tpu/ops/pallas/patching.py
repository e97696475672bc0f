"""Image -> patch-row rearrangement kernel (unfold).

TPU-native equivalent of reference vit/kernels/patching.py:7-105:
``(B, C, H, W) -> (B, (H/P)(W/P), C*P*P)`` with per-patch element order
(channel, row, col). The reference hardcodes C=3 with separate R/G/B loads
(reference patching.py:37-39); here channels are generic.

Formulation: both arrays are viewed 2-D (images as scanline rows, output as
patch rows) and the grid walks (batch, channel). Each program loads one
image channel's (H, W) scanline block, rearranges it in VMEM to the
(N, P*P) patch rows (a blocked transpose), and writes that channel's column
stripe of the output. Output rows are padded per image to a sublane
multiple (Mosaic requires block rows % 8 == 0) and sliced off afterwards.

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


def _patching_kernel(x_ref, o_ref, *, patch: int, n: int, n_pad: int):
    h, w = x_ref.shape
    hp, wp = h // patch, w // patch
    r = x_ref[:]                                   # (H, W) one channel
    r = r.reshape(hp, patch, wp, patch)
    r = r.transpose(0, 2, 1, 3)                    # (Hp, Wp, P, P)
    o_ref[0:n, :] = r.reshape(n, patch * patch)
    if n_pad != n:
        o_ref[n:n_pad, :] = jnp.zeros((n_pad - n, patch * patch),
                                      o_ref.dtype)


def patchify(x: jax.Array, patch_size: int, *,
             interpret: bool = False) -> jax.Array:
    """``(B, C, H, W) -> (B, N, C*P*P)``, N = (H/P)*(W/P)."""
    b, c, h, w = x.shape
    p = patch_size
    assert h % p == 0 and w % p == 0, (x.shape, p)
    n = (h // p) * (w // p)
    n_pad = round_up(n, 8)

    x2d = x.reshape(b * c * h, w)      # scanline rows (free reshape)

    kernel = functools.partial(_patching_kernel, patch=p, n=n, n_pad=n_pad)
    out = pl.pallas_call(
        kernel,
        grid=(b, c),
        in_specs=[pl.BlockSpec((h, w), lambda bb, cc: (bb * c + cc, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_pad, p * p), lambda bb, cc: (bb, cc),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n_pad, c * p * p), x.dtype),
        interpret=interpret,
    )(x2d)
    out = out.reshape(b, n_pad, c * p * p)
    return out[:, :n] if n_pad != n else out


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
