"""Probe: which int8 route wins at bs<=2 — the whole-encoder weight-only
stack, alternative stack plans, or the per-layer stacked int8 kernels
(i8dot / weight-only)?

Round-4 findings (v5e, B/16 bf16 activations) that set the encstackq
routing (vit_tpu/ops/pallas/block.py:encoder_stack_plan_q):

    bs=1  stack(768,768 tuned-float) 0.313 ms   layers-i8dot 0.286 ms
    bs=2  stack(768,768 tuned-float) 0.646 ms   layers-i8dot 0.460 ms
          stack(2304,768) 0.463     stack(768,512) 3.45 (Mosaic cliff!)

The per-layer stacked int8-dot path wins both small batches — the int8
stack's halved weight DMA is outweighed by its per-tile int8->float cast
on the VPU. The (768,512) bs=2 collapse is a b<=2 instance of the
scheduling cliff tracked in tools/encstack_probe.py.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from vit_tpu.config import VARIANTS
from vit_tpu.models.vit import init_params
from vit_tpu.quant import forward_quant, quantize_params
from vit_tpu.utils.timing import bench_chained

cfg = VARIANTS["B/16"].replace(dtype=jnp.bfloat16)
params = quantize_params(init_params(jax.random.key(0), cfg))
rng = np.random.default_rng(0)

def run(b, env):
    for k in ("VIT_TPU_STACK_PLAN", "VIT_TPU_INT8_DOT"):
        os.environ.pop(k, None)
    os.environ.update(env)
    px = jnp.asarray(rng.standard_normal((b, 3, 224, 224)), cfg.dtype)
    def step(c, params, px):
        x = px * (1.0 + c * 1e-30).astype(cfg.dtype)
        return jnp.mean(forward_quant(params, x, cfg, impl="pallas")).astype(jnp.float32)
    ms = bench_chained(step, reps=5, args=(params, px))
    print(f"bs={b} {env or 'default'}: {ms:.4f} ms", flush=True)
    for k in env: os.environ.pop(k, None)

for b in (1, 2):
    run(b, {})                                        # tuned stack plan
    for cq, mt in ((768, 1024), (768, 512), (384, 768), (2304, 768), (768, 1536)):
        run(b, {"VIT_TPU_STACK_PLAN": f"{cq},{mt}"})
    run(b, {"VIT_TPU_STACK_PLAN": "1,1"})             # stack off -> per-layer i8dot
    run(b, {"VIT_TPU_STACK_PLAN": "1,1", "VIT_TPU_INT8_DOT": "0"})  # per-layer weight-only
