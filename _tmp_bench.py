import jax, sys
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from vit_tpu.config import ViTConfig
from vit_tpu.models.vit import forward, init_params
from vit_tpu.utils.timing import bench_chained

dt = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16
impls = [("pallas", "flash"), ("xla", "unfused")]
if "--pallas-only" in sys.argv: impls = impls[:1]
cfg = ViTConfig(dtype=dt)
params = init_params(jax.random.key(0), cfg)
rng = np.random.default_rng(0)
for bs in [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [32]:
    x = jnp.asarray(rng.standard_normal((bs, 3, 224, 224)), jnp.float32)
    for impl, attn in impls:
        def step(c, params, x):
            out = forward(params, x * (1 + c * 1e-30), cfg, impl=impl, attention=attn)
            return jnp.mean(out).astype(jnp.float32)
        ms = bench_chained(step, args=(params, x))
        print(f"bs={bs:3d} {jnp.dtype(dt).name} {impl:6s}: {ms:8.3f} ms  {bs/ms*1e3:7.1f} img/s", flush=True)
