"""Minimized-repro bisect for the encoder_stack Mosaic scheduling collapse.

The whole-encoder mega-kernel (vit_tpu/ops/pallas/block.py:encoder_stack)
collapses ~6-10x on specific (b, cq, mt) combinations on v5e — same code,
same VMEM model (all cases sit far below the budget). This tool times
stripped-down kernel variants on the SAME grid + BlockSpec + scratch
structure to isolate which ingredient trips the cliff:

    full    the real encoder_stack (baseline)
    dma     same grid/BlockSpecs, body only touches each step's weight
            tile (sum -> accumulator): no scratch rows, no attention.
    scratch dma + the (m,d)+(3,m,d)+(m,d)f32 scratch allocs and a full-m
            read-modify-write per step (no per-image row slices).
    rows    scratch + per-image ROW-SLICE read/write in the b attention
            steps (dynamic rows, trivial compute — no dots).
    nodots  rows + LN + out-projection dot in the attention steps.
    lnqkv   nodots + the full kernel's LN1 recompute per QKV chunk step
            and LN2+GELU in the MLP steps (the VPU chain, no attn core).
    nosm    per-head attention dots + concat, softmax deleted.
    core    the real per-head attention body (--heads scales the chain).

ROUND-4 VERDICT (PERF.md 5b): the cliff is a per-step body-complexity x
step-count scheduler threshold, not any single ingredient. Measured on
B/16 geometry (us/layer): every variant fast at b<=2 (45-55, incl.
heads=24 = 48 unrolled head-blocks); at b=3 EITHER `core` with >=8 heads
(278-361) OR `lnqkv` (293) collapses alone while heads<=6 (53-57) and
`nodots` (51) stay fast. Ruled out: VMEM (limit sweep inert), DMA
windows (`dma` ~21-26 everywhere), softmax (`nosm`~`core`), head_dim,
total unroll size. The b=2 boundary is revision-sensitive: round-3's
(768,512) 3.45 ms collapse flipped to 0.63 ms after a dead-parameter
kernel refactor. Routing is therefore measurement-gated (tuned entries
only); this tool is the regression harness for the stable collapse mode:

    python tools/encstack_minrepro.py --variants core --cases 3,768,768
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_variant(variant: str, *, b, sp, d, mlp, L, cq, mt, dtype, heads=12):
    """A pallas_call with encoder_stack's exact grid + BlockSpec structure,
    with the kernel body stripped to `variant`'s ingredient set.

    A ``@flat`` suffix (e.g. ``dma@flat``, ``core@flat``) runs the SAME
    body on a 1-D grid (L*T,) with l/t derived by divmod — the round-5
    bs=1 slack probe: does collapsing the layer boundary out of the grid
    let Mosaic pipeline the weight-window stream across layers?"""
    flat = variant.endswith("@flat")
    if flat:
        variant = variant[:-len("@flat")]
    nq, nt = 3 * d // cq, mlp // mt
    m = b * sp
    T = nq + b + nt
    f32 = jnp.float32

    def kernel(x_ref, wqkv_ref, wout_ref, w1_ref, w2_ref, o_ref,
               xcur_ref, qkv_ref, acc_ref):
        if flat:
            i = pl.program_id(0)
            l, t = i // T, i % T
        else:
            l = pl.program_id(0)
            t = pl.program_id(1)

        @pl.when((l == 0) & (t == 0))
        def _():
            xcur_ref[:] = x_ref[:]
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for j in range(nq):
            @pl.when(t == j)
            def _(j=j):
                w = wqkv_ref[0].astype(f32)
                if variant == "dma":
                    acc_ref[0:1, :] = acc_ref[0:1, :] + jnp.sum(w)
                else:
                    xin = xcur_ref[:].astype(f32)
                    if variant == "lnqkv":
                        # the full kernel's LN1 recompute over all m rows,
                        # once per QKV chunk step
                        mu = jnp.mean(xin, axis=-1, keepdims=True)
                        xin = (xin - mu) * jax.lax.rsqrt(
                            jnp.mean(jnp.square(xin - mu), axis=-1,
                                     keepdims=True) + 1e-12)
                    # project into the qkv scratch (whole-m write, static
                    # column window like the real kernel's)
                    z = jax.lax.dot_general(
                        xin, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    start = j * cq
                    for p in range(3):
                        lo, hi = max(start, p * d), min(start + cq, (p + 1) * d)
                        if lo < hi:
                            qkv_ref[p, :, lo - p * d:hi - p * d] = (
                                z[:, lo - start:hi - start].astype(qkv_ref.dtype))

        for g in range(b):
            @pl.when(t == nq + g)
            def _(g=g):
                w = wout_ref[0].astype(f32)
                if variant == "dma":
                    acc_ref[0:1, :] = acc_ref[0:1, :] + jnp.sum(w)
                elif variant == "scratch":
                    # full-m touch, no per-image row slices
                    xcur_ref[:] += (qkv_ref[0] * 0.001).astype(xcur_ref.dtype)
                else:
                    rows = slice(g * sp, (g + 1) * sp)
                    q_all = qkv_ref[0, rows, :]
                    if variant == "rows":
                        xcur_ref[rows, :] += (q_all * 0.001).astype(
                            xcur_ref.dtype)
                    elif variant in ("nodots", "lnqkv"):  # LN + out proj dot
                        x32 = q_all.astype(f32)
                        mu = jnp.mean(x32, axis=-1, keepdims=True)
                        xn = (x32 - mu) * jax.lax.rsqrt(
                            jnp.mean(jnp.square(x32 - mu), axis=-1,
                                     keepdims=True) + 1e-12)
                        out = jax.lax.dot_general(
                            xn.astype(q_all.dtype), wout_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
                        xcur_ref[rows, :] += out.astype(xcur_ref.dtype)
                    else:
                        # 'core' = the real per-head attention body (the
                        # only ingredient 'nodots' lacks vs the full
                        # kernel); 'nosm' = same minus the softmax
                        # (scores feed the context dot raw). --heads
                        # scales the unrolled per-head chain length.
                        k_all = qkv_ref[1, rows, :]
                        v_all = qkv_ref[2, rows, :]
                        hd = d // heads
                        parts = []
                        for hh in range(heads):
                            hsl = slice(hh * hd, (hh + 1) * hd)
                            s = jax.lax.dot_general(
                                q_all[:, hsl], k_all[:, hsl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32) * (hd ** -0.5)
                            if variant == "core":
                                s = s - jnp.max(s, axis=-1, keepdims=True)
                                p = jnp.exp(s)
                                den = jnp.sum(p, axis=-1, keepdims=True)
                            else:  # nosm
                                p, den = s, 1.0
                            ctx = jax.lax.dot_general(
                                p.astype(v_all.dtype), v_all[:, hsl],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
                            parts.append(ctx / den)
                        ctx_all = jnp.concatenate(parts, axis=1).astype(
                            xcur_ref.dtype)
                        out = jax.lax.dot_general(
                            ctx_all, wout_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
                        xcur_ref[rows, :] += out.astype(xcur_ref.dtype)

        for c in range(nt):
            @pl.when(t == nq + b + c)
            def _(c=c):
                w1 = w1_ref[0]
                w2 = w2_ref[0]
                if variant == "dma":
                    acc_ref[0:1, :] = (acc_ref[0:1, :]
                                       + jnp.sum(w1.astype(f32))
                                       + jnp.sum(w2.astype(f32)))
                else:
                    xin = xcur_ref[:]
                    if variant == "lnqkv":
                        x32 = xin.astype(f32)
                        mu = jnp.mean(x32, axis=-1, keepdims=True)
                        xin = ((x32 - mu) * jax.lax.rsqrt(
                            jnp.mean(jnp.square(x32 - mu), axis=-1,
                                     keepdims=True) + 1e-12)).astype(
                                xin.dtype)
                    h = jax.lax.dot_general(
                        xin, w1, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    if variant == "lnqkv":
                        from vit_tpu.ops.pallas.activations import gelu
                        h = gelu(h)
                    acc_ref[:] += jax.lax.dot_general(
                        h.astype(w2.dtype), w2, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    if c == nt - 1:
                        xcur_ref[:] = acc_ref[:].astype(xcur_ref.dtype)

                @pl.when((c == nt - 1) & (l == L - 1))
                def _():
                    o_ref[:] = xcur_ref[:]

    last_q, last_m = nq - 1, nt - 1
    if flat:
        def ix(fn):  # lift an (l, t) index map onto the flat grid
            return lambda i: fn(i // T, i % T)
        grid = (L * T,)
        sem = ("arbitrary",)
    else:
        def ix(fn):
            return fn
        grid = (L, T)
        sem = ("arbitrary", "arbitrary")
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, d), ix(lambda l, t: (0, 0)),
                         memory_space=pltpu.VMEM),                   # x
            pl.BlockSpec((1, d, cq),
                         ix(lambda l, t: (l, 0, jnp.minimum(t, last_q))),
                         memory_space=pltpu.VMEM),                   # wqkv
            pl.BlockSpec((1, d, d), ix(lambda l, t: (l, 0, 0)),
                         memory_space=pltpu.VMEM),                   # wout
            pl.BlockSpec((1, d, mt),
                         ix(lambda l, t: (l, 0,
                                          jnp.clip(t - nq - b, 0, last_m))),
                         memory_space=pltpu.VMEM),                   # w1
            pl.BlockSpec((1, mt, d),
                         ix(lambda l, t: (l, jnp.clip(t - nq - b, 0, last_m),
                                          0)),
                         memory_space=pltpu.VMEM),                   # w2
        ],
        out_specs=pl.BlockSpec((m, d), ix(lambda l, t: (0, 0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), dtype),
        scratch_shapes=[
            pltpu.VMEM((m, d), dtype),
            pltpu.VMEM((3, m, d), dtype),
            pltpu.VMEM((m, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=sem,
            vmem_limit_bytes=int(os.environ.get(
                "VIT_TPU_STACK_VMEM_MB", "28")) * 2**20),
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cases", nargs="+",
                    default=["2,768,768", "2,768,512", "3,768,768",
                             "1,768,512"], help="b,cq,mt triplets")
    ap.add_argument("--variants", nargs="+",
                    default=["dma", "scratch", "rows", "nodots", "full"])
    ap.add_argument("--sp", type=int, default=208)
    ap.add_argument("-d", type=int, default=768)
    ap.add_argument("--mlp", type=int, default=3072)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("-L", type=int, default=12)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from vit_tpu.utils.timing import bench_chained

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    for case in args.cases:
        b, cq, mt = map(int, case.split(","))
        m = b * args.sp
        x = jnp.asarray(rng.standard_normal((m, args.d)) * 0.05, dtype)
        wqkv = jnp.asarray(
            rng.standard_normal((args.L, args.d, 3 * args.d)) * 0.05, dtype)
        wout = jnp.asarray(
            rng.standard_normal((args.L, args.d, args.d)) * 0.05, dtype)
        w1 = jnp.asarray(
            rng.standard_normal((args.L, args.d, args.mlp)) * 0.05, dtype)
        w2 = jnp.asarray(
            rng.standard_normal((args.L, args.mlp, args.d)) * 0.05, dtype)
        for variant in args.variants:
            if variant == "full":
                from vit_tpu.ops.pallas.block import encoder_stack
                enc = {"ln1": {"scale": jnp.ones((args.L, args.d), dtype),
                               "bias": jnp.zeros((args.L, args.d), dtype)},
                       "qkv": {"kernel": wqkv,
                               "bias": jnp.zeros((args.L, 3 * args.d), dtype)},
                       "out": {"kernel": wout,
                               "bias": jnp.zeros((args.L, args.d), dtype)},
                       "ln2": {"scale": jnp.ones((args.L, args.d), dtype),
                               "bias": jnp.zeros((args.L, args.d), dtype)},
                       "fc1": {"kernel": w1,
                               "bias": jnp.zeros((args.L, args.mlp), dtype)},
                       "fc2": {"kernel": w2,
                               "bias": jnp.zeros((args.L, args.d), dtype)}}
                os.environ["VIT_TPU_STACK_PLAN"] = f"{cq},{mt}"

                def step(c, x, enc=enc, b=b):
                    xc = (x * (1 + c * 1e-30)).astype(dtype)
                    out = encoder_stack(
                        xc.reshape(b, args.sp, args.d),
                        enc, num_heads=args.heads, seq_len=args.sp)
                    return jnp.mean(out).astype(jnp.float32)

                arg = (x,)
            else:
                fn = make_variant(variant, b=b, sp=args.sp, d=args.d,
                                  mlp=args.mlp, L=args.L, cq=cq, mt=mt,
                                  dtype=dtype, heads=args.heads)

                def step(c, x, wqkv, wout, w1, w2, fn=fn):
                    xc = (x * (1 + c * 1e-30)).astype(dtype)
                    out = fn(xc, wqkv, wout, w1, w2)
                    return jnp.mean(out).astype(jnp.float32)

                arg = (x, wqkv, wout, w1, w2)
            tag = f"b={b} cq={cq} mt={mt} {variant}"
            try:
                ms = bench_chained(step, reps=3, args=arg)
            except Exception as e:  # noqa: BLE001
                print(f"{tag}: FAIL {str(e)[:120]}", flush=True)
                continue
            finally:
                os.environ.pop("VIT_TPU_STACK_PLAN", None)
            print(f"{tag}: {ms:.4f} ms ({ms / args.L * 1e3:.1f} us/layer)",
                  flush=True)


if __name__ == "__main__":
    main()
