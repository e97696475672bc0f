"""Timing + benchmark harness (reference vit/utils.py:136-191).

The reference times with CUDA events + ``torch.cuda.synchronize`` (``timed``)
and a 25-warmup / 100-rep median loop (``benchmark``). The TPU equivalents:
``jax.block_until_ready`` for the sync boundary, an explicit warmup that also
absorbs XLA compilation (the analogue of Triton autotune's first-call cost,
reference vit/kernels/matmul.py:10-39), and median-of-reps with quantiles
matching ``triton.testing.do_bench`` (0.5/0.2/0.8).
"""

from __future__ import annotations

import time
from typing import Callable, Iterable

import jax
import numpy as np


def timed(fn: Callable, *args, **kwargs):
    """One timed call incl. device sync -> (result, milliseconds).

    Mirrors reference vit/utils.py:181-191.
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) * 1e3


def do_bench(fn: Callable, *, warmup: int = 25, reps: int = 100,
             quantiles=(0.5, 0.2, 0.8)) -> tuple[float, ...]:
    """Median (+ quantile) wall-clock ms of ``fn()`` — the role
    ``triton.testing.do_bench`` plays in every reference kernel ``__main__``."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = np.empty(reps)
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times[i] = (time.perf_counter() - t0) * 1e3
    return tuple(float(np.quantile(times, q)) for q in quantiles)


def benchmark_sweep(make_fns: Callable[[int], dict[str, Callable]],
                    sizes: Iterable[int], *, warmup: int = 25,
                    reps: int = 100):
    """Sweep a size axis comparing named implementations, yielding rows.

    The generator shape of reference vit/utils.py:136-178 ``benchmark``:
    for each size, build the competing callables, warm them up (compile),
    and report median/quantile ms per provider.

    Yields ``{"size": s, "<name>_ms": p50, "<name>_ms_lo": p20,
    "<name>_ms_hi": p80, ...}``.
    """
    for s in sizes:
        row: dict = {"size": s}
        for name, fn in make_fns(s).items():
            p50, p20, p80 = do_bench(fn, warmup=warmup, reps=reps)
            row[f"{name}_ms"] = p50
            row[f"{name}_ms_lo"] = p20
            row[f"{name}_ms_hi"] = p80
        yield row
