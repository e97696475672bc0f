"""Fixed-shape batch serving.

The reference's roadmap items 3-4 ("Given a batch size, fix all the tensor
sizes", "Use CUDA graphs to optimize kernel dispatch time" — reference
README.md:28-29) exist because dynamic shapes force per-op dispatch on GPU.
On TPU the same constraint is structural: every ``jit`` program is compiled
for one shape. This module turns that into a serving layer:

- :class:`Predictor` owns one compiled executable per bucket batch size
  (compile-once, reuse forever — the CUDA-graph replay equivalent).
- Arbitrary request sizes are served by greedily decomposing onto buckets
  (largest-first) and padding the remainder up to the smallest bucket that
  fits, slicing pad rows off the result. Padding is exact for ViT: images
  don't attend to each other, so pad images never influence real outputs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.config import ViTConfig
from vit_tpu.models.vit import Params, forward

DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


class Predictor:
    """Compiled fixed-shape forward passes over a set of batch buckets.

    >>> pred = Predictor(params, cfg, buckets=(1, 8, 32))
    >>> out = pred(images)         # any leading batch size
    """

    def __init__(self, params: Params, cfg: ViTConfig,
                 buckets: Sequence[int] = DEFAULT_BUCKETS, *,
                 impl: str | None = None, attention: str = "flash",
                 precompile: bool = False):
        self.cfg = cfg
        self.params = params
        self.buckets = tuple(sorted(set(buckets)))
        assert self.buckets and all(b > 0 for b in self.buckets)
        self._fn = jax.jit(
            lambda p, x: forward(p, x, cfg, impl=impl, attention=attention))
        if precompile:
            for b in self.buckets:
                shape = (b, cfg.num_channels, cfg.image_size, cfg.image_size)
                self._fn.lower(params, jax.ShapeDtypeStruct(
                    shape, cfg.dtype)).compile()

    def _plan(self, n: int) -> list[int]:
        """Decompose n onto buckets, largest-first; the tail rounds up to
        the smallest bucket that fits (pad)."""
        plan, rest = [], n
        for b in reversed(self.buckets):
            while rest >= b:
                plan.append(b)
                rest -= b
        if rest:
            plan.append(min(b for b in self.buckets if b >= rest))
        return plan

    def __call__(self, images) -> jax.Array:
        images = jnp.asarray(images, self.cfg.dtype)
        n = images.shape[0]
        assert n > 0, "empty batch"
        outs, off = [], 0
        for b in self._plan(n):
            take = min(b, n - off)
            chunk = images[off:off + take]
            if take < b:  # pad the tail bucket
                pad = jnp.zeros((b - take, *images.shape[1:]), self.cfg.dtype)
                chunk = jnp.concatenate([chunk, pad], axis=0)
            outs.append(self._fn(self.params, chunk)[:take])
            off += take
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
