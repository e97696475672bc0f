"""Bisect the encoder_stack b>=3 Mosaic scheduling collapse.

The whole-encoder mega-kernel (vit_tpu/ops/pallas/block.py:encoder_stack)
runs ~47 us/layer at b=2 bf16 on v5e but ~420 us/layer at b=3 and ~780 at
b=4 — same code, same plans. This probe separates the candidate causes:

- **rows (m = b*sp)** vs **batch count (b)**: the grid's second dimension
  is ``nq + b + nt`` (one attention sub-step per image) while the VMEM
  scratch scales with m. ``b=1,sp=624`` vs ``b=3,sp=208`` holds m fixed
  and varies b; ``b=2,sp=416`` vs ``b=4,sp=208`` likewise at m=832.
- **VMEM pressure**: ``VIT_TPU_STACK_VMEM_MB`` raises/lowers the kernel's
  ``vmem_limit_bytes`` (default 28) to test whether the collapse is the
  Mosaic allocator giving up double-buffering near the ceiling.
- **tile geometry**: per-case (cq, mt) override via VIT_TPU_STACK_PLAN.

Run (idle host!):
    python tools/encstack_probe.py --cases 2,208 3,208 4,208 1,624 2,416
    python tools/encstack_probe.py --cases 4,208 --vmem 24 28 32
    python tools/encstack_probe.py --cases 3,208 --plans 768,768 384,512

Capability context: the reference has no stacked-layer fusion at all (its
encoder is a Python loop of 78 kernel launches per layer, reference
vit/vit.py:167-169); this kernel and its tuning are TPU-native extensions.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def build(b: int, sp: int, d: int, mlp: int, L: int, dtype):
    rng = np.random.default_rng(0)
    arr = lambda *sh, sc=0.05: jnp.asarray(rng.standard_normal(sh) * sc, dtype)
    x = jnp.asarray(rng.standard_normal((b, sp, d)), dtype)
    enc = {
        "ln1": {"scale": arr(L, d, sc=0.2) + 1, "bias": arr(L, d)},
        "qkv": {"kernel": arr(L, d, 3 * d), "bias": arr(L, 3 * d)},
        "out": {"kernel": arr(L, d, d), "bias": arr(L, d)},
        "ln2": {"scale": arr(L, d, sc=0.2) + 1, "bias": arr(L, d)},
        "fc1": {"kernel": arr(L, d, mlp), "bias": arr(L, mlp)},
        "fc2": {"kernel": arr(L, mlp, d), "bias": arr(L, d)},
    }
    return x, enc


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cases", nargs="+", default=["2,208", "3,208", "4,208",
                                                   "1,624", "2,416"],
                    help="b,sp pairs")
    ap.add_argument("--plans", nargs="*", default=[],
                    help="cq,mt overrides (each case runs under each plan; "
                         "empty = the plan heuristic/tuned table)")
    ap.add_argument("--vmem", type=int, nargs="*", default=[],
                    help="VIT_TPU_STACK_VMEM_MB values (empty = default 28)")
    ap.add_argument("--seqlen", type=int, default=0,
                    help="real token count (< sp adds the in-kernel "
                         "attention column mask; 0 = sp, no mask)")
    ap.add_argument("-d", type=int, default=768)
    ap.add_argument("--mlp", type=int, default=3072)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("-L", type=int, default=12)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from vit_tpu.ops.pallas.block import encoder_stack, encoder_stack_plan
    from vit_tpu.utils.timing import bench_chained

    dtype = jnp.dtype(args.dtype)
    it = dtype.itemsize
    plans = args.plans or [None]
    vmems = args.vmem or [None]

    for case in args.cases:
        b, sp = map(int, case.split(","))
        x, enc = build(b, sp, args.d, args.mlp, args.L, dtype)

        sl = args.seqlen or sp

        def step(c, x, enc):
            out = encoder_stack(x * (1 + c * 1e-30).astype(dtype), enc,
                                num_heads=args.heads, seq_len=sl)
            return jnp.mean(out).astype(jnp.float32)

        for plan in plans:
            if plan is not None:
                os.environ["VIT_TPU_STACK_PLAN"] = plan
            else:
                os.environ.pop("VIT_TPU_STACK_PLAN", None)
            resolved = encoder_stack_plan(b, sp, args.d, args.mlp,
                                          args.heads, it)
            if resolved is None:
                # The b>2 gate blocks the heuristic — force a plan, preferring
                # the b<=2 winner but falling back to smaller tiles that fit
                # the VMEM budget at this m.
                for cand in ([plan] if plan else []) + ["768,768", "384,512",
                                                        "384,256", "128,256"]:
                    os.environ["VIT_TPU_STACK_PLAN"] = cand
                    resolved = encoder_stack_plan(b, sp, args.d, args.mlp,
                                                  args.heads, it)
                    if resolved is not None:
                        break
            if resolved is None:
                print(f"b={b} sp={sp} plan={plan}: INFEASIBLE", flush=True)
                continue
            for vm in vmems:
                if vm is not None:
                    os.environ["VIT_TPU_STACK_VMEM_MB"] = str(vm)
                else:
                    os.environ.pop("VIT_TPU_STACK_VMEM_MB", None)
                tag = (f"b={b} sp={sp} m={b*sp} cq={resolved['cq']} "
                       f"mt={resolved['mt']} vmem={vm or 28}MB")
                try:
                    ms = bench_chained(step, reps=3, args=(x, enc))
                except Exception as e:  # noqa: BLE001
                    print(f"{tag}: FAIL {str(e)[:100]}", flush=True)
                    continue
                print(f"{tag}: {ms:.4f} ms ({ms / args.L * 1e3:.1f} us/layer, "
                      f"{ms / args.L / b * 1e3:.1f} us/layer/img)", flush=True)
        os.environ.pop("VIT_TPU_STACK_PLAN", None)
        os.environ.pop("VIT_TPU_STACK_VMEM_MB", None)


if __name__ == "__main__":
    main()
