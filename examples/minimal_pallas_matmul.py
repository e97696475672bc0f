"""Minimal batched matmul in Pallas — the educational companion piece.

TPU-native counterpart of the reference's blog-post example
(reference examples/matmul_batch.py:5-139: a fixed-block, non-autotuned
Triton batched matmul with an allclose test). Shows the bare essentials of
a Pallas TPU kernel with none of the production machinery in
vit_tpu/ops/pallas/matmul.py (no block picking, no padding, no epilogues):

- a kernel is a Python function over VMEM refs;
- the grid tiles the output; BlockSpecs map grid positions to tiles;
- the MXU is reached through ``jnp.dot`` with an fp32 accumulator.

Run: ``python examples/minimal_pallas_matmul.py``  (any backend; uses the
interpreter off-TPU).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # one MXU-shaped tile in every direction — keep it simple


def matmul_kernel(x_ref, w_ref, o_ref, acc_ref, *, nk: int):
    """One (TILE, TILE) output tile; the K grid axis streams K tiles."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """(M, K) @ (K, N) with all dims multiples of TILE."""
    m, k = x.shape
    _, n = w.shape
    assert m % TILE == 0 and k % TILE == 0 and n % TILE == 0, (x.shape, w.shape)
    nk = k // TILE
    return pl.pallas_call(
        functools.partial(matmul_kernel, nk=nk),
        grid=(m // TILE, n // TILE, nk),
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TILE), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((TILE, TILE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=jax.default_backend() != "tpu",
    )(x, w)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 384)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((384, 512)) * 0.1, jnp.float32)
    got = np.asarray(matmul(x, w))
    want = np.asarray(x) @ np.asarray(w)
    diff = np.abs(got - want).max()
    print(f"minimal pallas matmul: max|diff| = {diff:.2e} "
          f"-> {'PASSED' if diff < 1e-3 else 'FAILED'}")
    assert diff < 1e-3
