"""Benchmark artifact writer (reference Performance.csv/png layout)."""

import csv
import os

import pytest

from vit_tpu.bench.artifacts import selftest, write_perf_report


def test_write_perf_report(tmp_path):
    rows = [{"N": 256, "pallas_ms": 1.0, "xla_ms": 2.0},
            {"N": 512, "pallas_ms": 2.0, "xla_ms": 4.0}]
    out = write_perf_report("unit", rows, x_key="N",
                            y_keys=["pallas_ms", "xla_ms"],
                            out_root=str(tmp_path))
    with open(os.path.join(out, "Performance.csv")) as f:
        got = list(csv.DictReader(f))
    assert got[0]["N"] == "256" and got[1]["xla_ms"] == "4.0"
    assert os.path.exists(os.path.join(out, "Performance.png"))


def test_selftest_passes_and_fails(capsys):
    selftest("ok", [1.0, 2.0], [1.0, 2.0], atol=1e-6)
    assert "PASSED" in capsys.readouterr().out
    with pytest.raises(AssertionError):
        selftest("bad", [1.0, 2.0], [1.0, 3.0], atol=1e-6)
    assert "FAILED" in capsys.readouterr().out


def test_published_csvs_are_sane():
    # Round-1 lesson: a noise-dominated timing harness published negative
    # times (-97 TFLOP/s) — every committed artifact must stay positive.
    import glob

    paths = glob.glob("benchmarks/**/*.csv", recursive=True)
    assert paths, "published benchmark artifacts missing"
    for p in paths:
        with open(p) as f:
            rows = list(csv.DictReader(f))
        assert rows, p
        for row in rows:
            for k, v in row.items():
                try:
                    x = float(v)
                except (TypeError, ValueError):
                    continue
                assert x >= 0, (p, k, v)


def test_write_perf_report_html(tmp_path):
    rows = [{"N": 256, "ms": 1.0}, {"N": 512, "ms": 2.0}]
    out = write_perf_report("unit_html", rows, x_key="N", y_keys=["ms"],
                            out_root=str(tmp_path))
    html = open(os.path.join(out, "results.html")).read()
    assert "<td>512</td>" in html and "<th>ms</th>" in html
