"""Shared helpers for the Pallas kernel library."""

from __future__ import annotations

import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def min_sublanes(dtype) -> int:
    """Minimum second-minor tile dimension for a dtype (lane dim is 128)."""
    itemsize = jnp.dtype(dtype).itemsize
    return {4: 8, 2: 16, 1: 32}.get(itemsize, 8)


def pick_row_block(num_rows: int, row_bytes: int, *, dtype,
                   budget_bytes: int = 2 * 1024 * 1024,
                   cap: int = 1024) -> int:
    """Rows per block for row-parallel (elementwise / normalization) kernels.

    Sized so one block stays within ``budget_bytes`` (leaving VMEM room for
    double-buffering and multiple operands), rounded to the dtype's sublane
    multiple.
    """
    sub = min_sublanes(dtype)
    rows = max(sub, budget_bytes // max(row_bytes, 1))
    rows = min(rows, cap, round_up(num_rows, sub))
    return round_up(rows, sub) if rows % sub else rows


def as_rows(x):
    """View (..., D) as (M, D) plus a restore function."""
    d = x.shape[-1]
    flat = x.reshape(-1, d)
    return flat, (lambda y: y.reshape(*x.shape[:-1], y.shape[-1]))


def pad_dim(x, axis: int, multiple: int):
    """Zero-pad ``axis`` up to a multiple; returns (padded, original_size)."""
    size = x.shape[axis]
    target = round_up(size, multiple)
    if target == size:
        return x, size
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads), size
