"""On-chip probe: does Mosaic lower an int8 x int8 -> int32 MXU dot, and
how fast is it vs bf16 at the model's MLP shapes?

Decides whether the quant tier's THROUGHPUT path (activation-quantized
int8 dots inside the mega-kernels, 2x the bf16 MXU rate on v5e spec)
is worth building, or whether int8 stays weight-only (bandwidth win
only — mlp_block_q / encoder_stack_q). Run on TPU:

    python tools/int8_probe.py           # compile + correctness + timing

Safe by construction: tiny shapes first (a failed Mosaic compile of a
big kernel can wedge this platform's shared compile service — see
.claude/skills/verify/SKILL.md), and every kernel is also checked in
interpret mode before the real compile.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.utils.timing import bench_chained


def _dot_kernel(x_ref, w_ref, o_ref, *, out_dtype):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=out_dtype)


def pallas_dot(x, w, out_dtype, interpret=False):
    m, k = x.shape
    _, n = w.shape
    return pl.pallas_call(
        functools.partial(_dot_kernel, out_dtype=out_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(x, w)


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    # 1. tiny int8 dot — interpret, then compiled
    xq = jnp.asarray(rng.integers(-127, 128, (128, 128)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (128, 128)), jnp.int8)
    want = np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)
    got_i = np.asarray(pallas_dot(xq, wq, jnp.int32, interpret=True))
    assert (got_i == want).all(), "interpret-mode int8 dot wrong"
    print("interpret int8 dot: OK", file=sys.stderr)
    try:
        got = np.asarray(jax.jit(
            lambda a, b: pallas_dot(a, b, jnp.int32))(xq, wq))
    except Exception as e:
        print(f"COMPILED int8 dot FAILED: {str(e)[:300]}", file=sys.stderr)
        print('{"int8_mxu": false}')
        return
    ok = (got == want).all()
    print(f"compiled int8 dot: {'OK' if ok else 'WRONG'}", file=sys.stderr)

    # 1b. the real kernel, tiny shape: mlp_block_i8dot compile check
    from vit_tpu.ops.pallas.block import mlp_block_i8dot
    from vit_tpu.quant import quantize_weight
    d0, mlp0, m0 = 128, 256, 16
    x0 = jnp.asarray(rng.standard_normal((1, m0, d0)) * 0.1, jnp.float32)
    w1 = quantize_weight(jnp.asarray(
        rng.standard_normal((d0, mlp0)) * 0.05, jnp.float32))
    w2 = quantize_weight(jnp.asarray(
        rng.standard_normal((mlp0, d0)) * 0.05, jnp.float32))
    z = jnp.zeros
    try:
        out = mlp_block_i8dot(x0, jnp.ones((d0,)), z((d0,)), w1["q"],
                              w1["scale"], z((mlp0,)), w2["q"], w2["scale"],
                              z((d0,)))
        ok2 = bool(np.isfinite(np.asarray(out, np.float32)).all())
        print(f"mlp_block_i8dot tiny compile: {'OK' if ok2 else 'NONFINITE'}",
              file=sys.stderr)
    except Exception as e:
        print(f"mlp_block_i8dot compile FAILED: {str(e)[:300]}",
              file=sys.stderr)

    # 2. timing at the MLP shape (m=6656 is the bs=32 fc1 row count)
    m, k, n = 1664, 768, 3072
    xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    xb = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

    def step_i8(c, x, w):
        # live fp32-carry dependency that is numerically a no-op for int8
        x = x + jnp.round(c * 1e-30).astype(jnp.int8)
        return pallas_dot(x, w, jnp.int32).astype(jnp.float32).mean()

    def step_bf(c, x, w):
        x = x * (1.0 + c * 1e-30).astype(jnp.bfloat16)
        return pallas_dot(x, w, jnp.float32).astype(jnp.float32).mean()

    ms_i8 = bench_chained(step_i8, args=(xq, wq))
    ms_bf = bench_chained(step_bf, args=(xb, wb))
    tf = 2 * m * k * n / 1e12
    print(f"int8: {ms_i8:.4f} ms = {tf / (ms_i8 / 1e3):.1f} TOPS | "
          f"bf16: {ms_bf:.4f} ms = {tf / (ms_bf / 1e3):.1f} TF/s",
          file=sys.stderr)
    print(f'{{"int8_mxu": {str(bool(ok)).lower()}, '
          f'"int8_ms": {ms_i8:.4f}, "bf16_ms": {ms_bf:.4f}}}')


if __name__ == "__main__":
    main()
