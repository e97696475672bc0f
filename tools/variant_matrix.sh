#!/bin/bash
# Full variant benchmark matrix (VERDICT r2 item 4): B/32, L/16, L/16-384,
# H/14 at bs 1/8/32/64, bf16 then int8, tuned plans where recorded.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
for v in B/32 L/16 L/16-384 H/14; do
  python -m vit_tpu.bench.model --variant $v --batches 1 8 32 64 \
    >/tmp/variant_$(echo $v | tr '/' '_').log 2>&1
  echo "== $v bf16 rc=$? =="
done
for v in B/32 L/16 L/16-384 H/14; do
  python -m vit_tpu.bench.model --variant $v --quant --batches 1 8 32 64 \
    >/tmp/variant_$(echo $v | tr '/' '_')_q.log 2>&1
  echo "== $v int8 rc=$? =="
done
echo ALL_VARIANTS_DONE
