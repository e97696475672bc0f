#!/bin/bash
# Regenerate every standalone kernel sweep in the production dtype (bf16)
# so kernel dirs gain fresh CSVs + results.html (VERDICT r2 item 3).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
for mod in add layernorm softmax matmul matmul3 patch_embed attention; do
  python -m vit_tpu.ops.pallas.$mod --dtype bfloat16 --bench \
    >/tmp/sweep_$mod.log 2>&1
  echo "== $mod rc=$? =="
done
echo ALL_SWEEPS_DONE
