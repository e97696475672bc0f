"""A/B the embed-fold (encoder_stack_fused) against the separate
embed_fused + encoder_stack + final-LN chain, same process, bs 1-2.

VIT_TPU_FOLD_EMBED=0 disables the folded route in models/vit.py:forward.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vit_tpu.config import VARIANTS
from vit_tpu.models.vit import forward, init_params
from vit_tpu.utils.timing import bench_chained

import jax.numpy as _jnp
cfg = VARIANTS["B/16"].replace(dtype=_jnp.bfloat16)
params = init_params(jax.random.key(0), cfg)
rng = np.random.default_rng(0)
for b in (1, 2):
    px = jnp.asarray(rng.standard_normal((b, 3, 224, 224)), cfg.dtype)

    def mk(fold):
        def step(c, params, px):
            x = px * (1.0 + c * 1e-30).astype(cfg.dtype)
            os.environ["VIT_TPU_FOLD_EMBED"] = fold
            return jnp.mean(forward(params, x, cfg,
                                    impl=None)).astype(jnp.float32)
        return step

    # parity first (fold vs no-fold on-chip)
    os.environ["VIT_TPU_FOLD_EMBED"] = "1"
    y1 = forward(params, px, cfg, impl=None)
    os.environ["VIT_TPU_FOLD_EMBED"] = "0"
    y0 = forward(params, px, cfg, impl=None)
    d = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y0.astype(jnp.float32))))
    print(f"b={b} fold-vs-chain maxdiff {d:.2e}", flush=True)
    for r in range(3):
        for fold in ("0", "1"):
            ms = bench_chained(mk(fold), reps=5, args=(params, px))
            print(f"b={b} fold={fold} round{r}: {ms:.4f} ms", flush=True)
