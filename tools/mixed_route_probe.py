"""One-off in-situ probe: XLA int8 attention + pallas int8 MLP at bs 32/64.

The isolated shootout (tools/attn_q_bench.py) shows the XLA int8 chain
beating attn_block_q per-block at b=32 (0.242 vs 0.287 ms) while losing
3x at b=64. This measures whether that isolated win survives inside the
full 12-layer scan — if yes, routing should prefer the XLA chain at that
batch; if no (fusion context changes the picture), keep attn_block_q.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

import vit_tpu.ops.pallas.block as blk
from vit_tpu.config import ViTConfig
from vit_tpu.models import vit
from vit_tpu.quant import forward_quant, quantize_params
from vit_tpu.utils.timing import bench_chained

cfg = ViTConfig(dtype=jnp.bfloat16)
params = quantize_params(vit.init_params(jax.random.key(0), cfg))
rng = np.random.default_rng(0)

real_plan = blk.attn_block_q_plan

for b in [32, 64]:
    px = jnp.asarray(rng.standard_normal((b, 3, 224, 224)), jnp.bfloat16)
    for name, plan in [("attn_block_q", real_plan),
                       ("xla-attn-mix", lambda *a, **k: None)]:
        blk.attn_block_q_plan = plan

        def step(c, p, x):
            x = x * (1.0 + c * 1e-30).astype(cfg.dtype)
            out = forward_quant(p, x, cfg, impl="pallas")
            return jnp.mean(out).astype(jnp.float32)

        ms = bench_chained(step, reps=5, args=(params, px))
        print(f"{name:14s} b={b:3d}  {ms:8.3f} ms  {b / ms * 1e3:7.1f} img/s")
blk.attn_block_q_plan = real_plan
