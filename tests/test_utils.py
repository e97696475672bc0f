"""Tracing/timing utils (reference vit/utils.py equivalents)."""

import logging

import jax.numpy as jnp
import numpy as np

from vit_tpu.utils import tensor_info, timed
from vit_tpu.utils.timing import do_bench


def test_tensor_info_logs_shapes(caplog):
    @tensor_info
    def f(x, y):
        return x + y

    with caplog.at_level(logging.INFO, logger="vit_tpu"):
        out = f(jnp.ones((2, 3)), jnp.ones((2, 3)))
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones((2, 3)))
    msgs = [r.message for r in caplog.records]
    assert any("(2, 3)" in m and "<-" in m for m in msgs)
    assert any("(2, 3)" in m and "->" in m for m in msgs)


def test_tensor_info_named():
    @tensor_info(name="custom")
    def f(x):
        return x * 2

    np.testing.assert_array_equal(np.asarray(f(jnp.ones(3))), 2 * np.ones(3))


def test_timed_returns_result_and_ms():
    out, ms = timed(lambda a: a * 2, jnp.ones((4,)))
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones(4))
    assert ms > 0


def test_do_bench_quantiles():
    p50, p20, p80 = do_bench(lambda: jnp.ones((8,)) + 1, warmup=1, reps=5)
    assert p20 <= p50 <= p80
