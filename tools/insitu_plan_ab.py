"""In-situ plan A/B: force (attn, mlp) plan candidates in the FULL model
forward and time end-to-end, interleaved, same process.

The offline tuner (vit_tpu/bench/tune.py) times kernels STANDALONE with
sliced weights; the model runs the stacked-weight form under lax.scan,
whose DMA/compute balance differs (in-kernel weight reads overlap the
scan). When a sweep row's MFU lags its neighbors despite a tuned entry,
this probe finds the in-situ winner directly.

Usage (on TPU):
    python tools/insitu_plan_ab.py --batch 8 \
        --mlp 0,4,512 1664,8,384 832,4,512 --attn mstream,1 mstream,2
"""
from __future__ import annotations

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="B/16")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, required=True)
    ap.add_argument("--mlp", nargs="+", default=["tuned"],
                    help='bm,nt,ct candidates ("tuned" = no forcing)')
    ap.add_argument("--attn", nargs="+", default=["tuned"],
                    help='mstream,<g> | wstream | tuned')
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from vit_tpu.config import VARIANTS
    from vit_tpu.models.vit import forward, init_params
    from vit_tpu.utils.timing import bench_chained

    cfg = VARIANTS[args.variant].replace(dtype=jnp.dtype(args.dtype))
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal(
        (args.batch, 3, cfg.image_size, cfg.image_size)), cfg.dtype)

    combos = list(itertools.product(args.mlp, args.attn))
    results = {c: [] for c in combos}

    def mk(mlp_plan, attn_plan):
        def step(c, params, px):
            # env is read at TRACE time by the plan fns; each combo gets
            # its own closure -> its own trace.
            if mlp_plan != "tuned":
                os.environ["VIT_TPU_MLP_PLAN"] = mlp_plan
            else:
                os.environ.pop("VIT_TPU_MLP_PLAN", None)
            if attn_plan != "tuned":
                os.environ["VIT_TPU_ATTN_PLAN"] = attn_plan
            else:
                os.environ.pop("VIT_TPU_ATTN_PLAN", None)
            x = px * (1.0 + c * 1e-30).astype(cfg.dtype)
            return jnp.mean(forward(params, x, cfg)).astype(jnp.float32)
        return step

    for r in range(args.rounds):
        for combo in combos:
            try:
                ms = bench_chained(mk(*combo), reps=5, args=(params, px))
            except Exception as e:  # noqa: BLE001
                print(f"round{r} mlp={combo[0]} attn={combo[1]}: "
                      f"FAIL {str(e)[:100]}", flush=True)
                results[combo].append(float("nan"))
                continue
            finally:
                os.environ.pop("VIT_TPU_MLP_PLAN", None)
                os.environ.pop("VIT_TPU_ATTN_PLAN", None)
            print(f"round{r} mlp={combo[0]} attn={combo[1]}: {ms:.4f} ms",
                  flush=True)
            results[combo].append(ms)

    print("\n== medians ==", flush=True)
    for combo, v in sorted(results.items(),
                           key=lambda kv: np.nanmedian(kv[1])):
        med = float(np.nanmedian(v))
        print(f"mlp={combo[0]:>12} attn={combo[1]:>10}: {med:.4f} ms "
              f"({args.batch / med * 1e3:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
