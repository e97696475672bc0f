"""Row softmax kernel.

TPU-native equivalent of reference vit/kernels/softmax.py:9-74 (numerically
stable: subtract row max, exp, normalize). The reference loads each row as a
single ``next_power_of_2(D)`` block, capping row length at SRAM size
(reference softmax.py:54 — a design limit SURVEY.md §5 calls out); here a
block is (rows, D) in VMEM with the full row visible to the VPU, and rows
are tiled over the grid, so wide rows and many rows both pipeline. (For
attention the production path is the fused flash kernel —
vit_tpu/ops/pallas/attention.py — which never materializes score rows at
all; this standalone softmax mirrors the reference's library surface.)

Math in fp32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.common import as_rows, cdiv, pick_row_block, round_up


def _softmax_kernel(x_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    x = x - jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x)
    o_ref[:] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(o_ref.dtype)


def softmax(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Softmax over the last dim of ``(..., D)``."""
    xf, restore = as_rows(x)
    m, d = xf.shape
    bm = pick_row_block(m, round_up(d, 128) * 4, dtype=x.dtype)

    out = pl.pallas_call(
        _softmax_kernel,
        grid=(cdiv(m, bm),),
        in_specs=[pl.BlockSpec((bm, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        interpret=interpret,
    )(xf)
    return restore(out)


if __name__ == "__main__":
    import argparse

    import numpy as np

    from vit_tpu.bench.artifacts import selftest, write_perf_report
    from vit_tpu.ops import reference
    from vit_tpu.ops.dispatch import interpret_mode
    from vit_tpu.utils.timing import bench_chained

    ap = argparse.ArgumentParser(description="softmax self-test + bench")
    ap.add_argument("-B", type=int, default=4)
    ap.add_argument("-N", type=int, default=197)
    ap.add_argument("-D", type=int, default=197)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.B, args.N, args.D)) * 10, dt)
    got = softmax(x, interpret=interpret_mode())
    selftest("softmax", got, reference.softmax(x),
             atol=1e-6 if dt == jnp.float32 else 5e-3)

    if args.bench:
        rows = []
        for d in [128, 256, 512, 1024, 2048]:
            a = jnp.asarray(rng.standard_normal((args.B, 1024, d)), dt)

            # Operands as jit ARGUMENTS, not closure constants (closure
            # capture inflates tunneled measurements ~1.7x).
            def mk(fn):
                def step(c, a):
                    out = fn(a * (1 + c * 1e-30).astype(dt))
                    return jnp.mean(out).astype(jnp.float32)
                return step

            pal = bench_chained(mk(lambda u: softmax(u)), lengths=(100, 2100), args=(a,))
            xla = bench_chained(mk(reference.softmax), lengths=(100, 2100), args=(a,))
            gbps = 2 * args.B * 1024 * d * dt.itemsize / 1e9
            rows.append({"D": d, "pallas_ms": pal, "xla_ms": xla,
                         "pallas_gbps": gbps / (pal / 1e3),
                         "xla_gbps": gbps / (xla / 1e3)})
            print(rows[-1])
        write_perf_report("softmax", rows, x_key="D",
                          y_keys=["pallas_gbps", "xla_gbps"], y_label="GB/s")
