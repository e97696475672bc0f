"""Persisted autotune table for the Pallas kernel tier.

The reference autotunes 25 block configs per matmul shape at first call
(reference vit/kernels/matmul.py:10-39) and 18 for add (add.py:7-29) —
paying a per-process search every run. The TPU equivalent here is an
*offline* sweep (``python -m vit_tpu.bench.tune`` on a real chip) whose
winners are persisted to ``tuned_configs.json`` next to this module and
consulted at trace time; shapes without an entry fall back to the static
heuristics in each kernel. Offline-search + persisted-table is the idiomatic
split on TPU: compiles are expensive (minutes through this platform's
remote compile service), so the search must never run inside a production
process.

Key format: ``"<op>:<dtype>:<d0>x<d1>x..."``. Conventions per op:

- ``matmul``  — dims ``(m, n, kp)`` (kp = K after lane padding); value
  ``{"bm", "bn", "bk"}``. A wildcard entry with ``m=0`` matches any m for
  that (n, kp) — model matmuls share (n, kp) across batch sizes.
- ``flash``   — dims ``(sp, d)`` (padded seq, head dim); value
  ``{"group"}``: preferred heads-per-grid-step, clamped to a divisor of
  B*H at call time.
- ``matmul3`` — dims ``(mp, kp, n)`` per-batch tile; value ``{"group"}``.
"""

from __future__ import annotations

import functools
import hashlib
import importlib
import inspect
import json
import os

import jax.numpy as jnp

_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "tuned_configs.json")

#: Kernel-body sources that define each op's measured behavior. Tuned
#: entries are valid only for the kernel revision they were measured on:
#: the round-4 minimized repro (PERF.md §5b) showed a dead-parameter edit
#: to a kernel body swinging a recorded plan 5.5x (Mosaic scheduling is
#: sensitive to the emitted body, not just its semantics). ``rev(op)``
#: hashes these sources; ``lookup`` treats an entry whose stamped ``rev``
#: differs as a MISS (fall back to the conservative heuristic) so editing
#: a kernel can never silently serve stale winners. Re-stamp with
#: ``python tools/reprove.py`` on a real chip.
_REV_SOURCES: dict[str, tuple[str, tuple[str, ...]]] = {
    "matmul": ("vit_tpu.ops.pallas.matmul",
               ("_matmul_kernel", "_matmul_kernel_nk1",
                "_fused_linear_kernel", "_fused_linear_kernel_nk1")),
    "flash": ("vit_tpu.ops.pallas.attention",
              ("_flash_kernel", "_flash_group_rows_kernel",
               "_flash_group_kernel", "_flash_qtile_kernel")),
    "flash3d": ("vit_tpu.ops.pallas.attention",
                ("_flash_kernel", "_flash_group_rows_kernel",
                 "_flash_group_kernel", "_flash_qtile_kernel")),
    "mlpblock": ("vit_tpu.ops.pallas.block", ("_mlp_kernel",)),
    "mlpblocki8": ("vit_tpu.ops.pallas.block",
                   ("_mlp_q_kernel", "_mlp_i8dot_kernel")),
    "attnblock": ("vit_tpu.ops.pallas.block",
                  ("_ln32", "_attn_core", "_attn_kernel",
                   "_attn_wstream_kernel")),
    "attnqblock": ("vit_tpu.ops.pallas.block",
                   ("_ln32", "_attn_q_core", "_attn_q_kernel")),
    "layerblock": ("vit_tpu.ops.pallas.block", ("_layer_kernel",)),
    "encstack": ("vit_tpu.ops.pallas.block", ("_encoder_stack_kernel",)),
    "encstackq": ("vit_tpu.ops.pallas.block",
                  ("_encoder_stack_q_kernel",)),
}


@functools.lru_cache(maxsize=None)
def rev(op: str) -> str | None:
    """Current kernel-body revision for ``op`` (10-hex sha256 of the
    registered kernel sources), or None for unregistered ops."""
    spec = _REV_SOURCES.get(op)
    if spec is None:
        return None
    mod = importlib.import_module(spec[0])
    src = "\n".join(inspect.getsource(getattr(mod, name))
                    for name in spec[1])
    return hashlib.sha256(src.encode()).hexdigest()[:10]


def _rev_ok(op: str, entry: dict | None) -> dict | None:
    """Entry passes only if its stamped rev matches the live kernel
    source (entries for unregistered ops are exempt)."""
    if entry is None:
        return None
    want = rev(op)
    if want is not None and entry.get("rev") != want:
        return None
    return entry


def _dtype_tag(dtype) -> str:
    return jnp.dtype(dtype).name


@functools.lru_cache(maxsize=1)
def _load_cached(mtime: float) -> dict:
    try:
        with open(_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def table() -> dict:
    """The current table (re-read when the file changes on disk)."""
    try:
        mtime = os.path.getmtime(_PATH)
    except OSError:
        mtime = 0.0
    return _load_cached(mtime)


def key(op: str, dtype, dims: tuple[int, ...]) -> str:
    return f"{op}:{_dtype_tag(dtype)}:" + "x".join(map(str, dims))


def lookup(op: str, dtype, dims: tuple[int, ...]) -> dict | None:
    """Exact-match lookup, then the leading-dim-0 wildcard (the leading dim
    is the batch-dependent one for every op: m for matmul, B*H for flash)."""
    exact, wild = lookup_split(op, dtype, dims)
    return exact if exact is not None else wild


def lookup_split(op: str, dtype,
                 dims: tuple[int, ...]) -> tuple[dict | None, dict | None]:
    """(exact hit, leading-dim-0 wildcard hit) — for callers whose static
    heuristic should outrank a wildcard measured at a different leading dim
    but never an exact-shape measurement (the block kernels: a bs=32
    wildcard must not force the throughput layout onto bs=1)."""
    t = table()
    exact = _rev_ok(op, t.get(key(op, dtype, dims)))
    wild = None
    if dims and dims[0] != 0:
        wild = _rev_ok(op, t.get(key(op, dtype, (0,) + dims[1:])))
    return exact, wild


def record(op: str, dtype, dims: tuple[int, ...], value: dict, *,
           extra: dict | None = None) -> None:
    """Persist one winner (used by the tune CLI, never by kernels).
    Stamps the current kernel-body revision so the entry self-invalidates
    if the kernel source later changes (see :func:`rev`)."""
    t = dict(table())
    entry = dict(value)
    r = rev(op)
    if r is not None:
        entry["rev"] = r
    if extra:
        entry["_meta"] = extra
    t[key(op, dtype, dims)] = entry
    tmp = _PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(t, f, indent=1, sort_keys=True)
    os.replace(tmp, _PATH)
    _load_cached.cache_clear()


def forget(op: str, dtype, dims: tuple[int, ...]) -> None:
    """Drop an entry (used by the tune CLI when a re-sweep shows the
    opt-in kernel losing — for opt-in ops an absent entry IS the routing
    decision to keep the default path)."""
    t = dict(table())
    if t.pop(key(op, dtype, dims), None) is None:
        return
    tmp = _PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(t, f, indent=1, sort_keys=True)
    os.replace(tmp, _PATH)
    _load_cached.cache_clear()
