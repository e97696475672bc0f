"""Benchmark harness (the reference's L5 tier: perf_report artifacts)."""

from vit_tpu.bench.artifacts import write_perf_report

__all__ = ["write_perf_report"]
