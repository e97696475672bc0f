#!/usr/bin/env bash
# Regenerate every benchmark artifact on the real TPU with the trusted
# (span-checked least-squares) timing harness — reference artifact layout:
# benchmarks/<kernel>/Performance.{csv,png} + benchmarks/model/.
#
# Run with an OTHERWISE IDLE HOST: concurrent CPU load poisons the tunneled
# device's RPC servicing and inflates every measurement (round-2 lesson).
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

DTYPE=${1:-bfloat16}

run() { echo "=== $* ==="; timeout 2400 "$@" || echo "FAILED ($?): $*"; }

run python -m vit_tpu.ops.pallas.add        --dtype "$DTYPE" --bench
run python -m vit_tpu.ops.pallas.layernorm  --dtype "$DTYPE" --bench
run python -m vit_tpu.ops.pallas.softmax    --dtype "$DTYPE" --bench
run python -m vit_tpu.ops.pallas.matmul     --dtype "$DTYPE" --bench
run python -m vit_tpu.ops.pallas.matmul3    --dtype "$DTYPE" --bench
run python -m vit_tpu.ops.pallas.patch_embed --dtype "$DTYPE" --bench
run python -m vit_tpu.ops.pallas.patching   --bench
run python -m vit_tpu.ops.pallas.attention  --dtype "$DTYPE" --bench
run python -m vit_tpu.bench.model --dtype "$DTYPE"
run python -m vit_tpu.bench.serving --dtype "$DTYPE"
echo "done"
