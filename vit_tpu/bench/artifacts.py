"""Benchmark artifact writer — reference-format Performance.csv / .png.

The reference emits ``benchmarks/<kernel>/Performance.{csv,png}`` per kernel
via ``triton.testing.perf_report`` (e.g. reference vit/kernels/add.py:139-181)
and ``benchmarks/model/benchmark_vit.csv`` for the end-to-end sweep
(reference vit/vit.py:296-327). This module reproduces that artifact layout
so results are apples-to-apples comparable.
"""

from __future__ import annotations

import csv
import os
from typing import Sequence


def write_perf_report(name: str, rows: Sequence[dict], *,
                      x_key: str, y_keys: Sequence[str],
                      y_label: str = "ms",
                      out_root: str = "benchmarks",
                      plot: bool = True) -> str:
    """Write ``<out_root>/<name>/Performance.csv`` (+ ``.png`` when
    matplotlib is available). Returns the directory written."""
    out_dir = os.path.join(out_root, name)
    os.makedirs(out_dir, exist_ok=True)

    # Union of keys across ALL rows (first-seen order): sweep rows can gain
    # columns partway (e.g. reference-baseline columns only at batches that
    # have published numbers), and DictWriter raises on unknown fieldnames.
    seen = dict.fromkeys([x_key])
    for r in rows:
        seen.update(dict.fromkeys(r))
    keys = list(seen)
    csv_path = os.path.join(out_dir, "Performance.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)

    # results.html — the reference's third artifact (perf_report writes
    # csv+png+html per kernel): a self-contained sortable table.
    html_rows = "\n".join(
        "<tr>" + "".join(f"<td>{r.get(k, '')}</td>" for k in keys) + "</tr>"
        for r in rows)
    with open(os.path.join(out_dir, "results.html"), "w") as f:
        f.write(
            "<!doctype html><html><head><meta charset='utf-8'>"
            f"<title>{name}</title><style>body{{font:14px sans-serif}}"
            "table{border-collapse:collapse}td,th{border:1px solid #999;"
            "padding:4px 8px;text-align:right}th{background:#eee}</style>"
            f"</head><body><h2>{name}</h2><table><tr>"
            + "".join(f"<th>{k}</th>" for k in keys)
            + f"</tr>\n{html_rows}\n</table>"
            + "<p><img src='Performance.png' alt=''></p></body></html>")

    if not plot:  # single-row reports (e.g. serving) have nothing to plot
        return out_dir
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return out_dir

    fig, ax = plt.subplots(figsize=(8, 5))
    xs = [r[x_key] for r in rows]
    for yk in y_keys:
        ax.plot(xs, [r[yk] for r in rows], marker="o", label=yk)
    ax.set_xlabel(x_key)
    ax.set_ylabel(y_label)
    ax.set_title(name)
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.savefig(os.path.join(out_dir, "Performance.png"),
                bbox_inches="tight", dpi=110)
    plt.close(fig)
    return out_dir


def selftest(name: str, got, want, *, atol: float, rtol: float = 0.0) -> None:
    """Print-and-assert allclose check — the reference's per-kernel
    ``__main__`` verification pattern (e.g. reference vit/kernels/matmul.py:159-192)."""
    import numpy as np

    got = np.asarray(got, dtype=np.float32)
    want = np.asarray(want, dtype=np.float32)
    diff = np.abs(got - want).max()
    ok = np.allclose(got, want, atol=atol, rtol=rtol)
    print(f"[{name}] max-abs-diff={diff:.3e} atol={atol:g} "
          f"{'PASSED' if ok else 'FAILED'}")
    assert ok, f"{name} self-test failed: max-abs-diff {diff}"
