"""Test-suite environment: CPU backend with 8 virtual devices.

Tests run everywhere (no TPU required): Pallas kernels execute in interpreter
mode (``VIT_TPU_INTERPRET=1``) — the CPU "fake backend" the reference lacks
(its tests all assert ``.is_cuda``, SURVEY.md §4) — and sharding tests get an
8-device virtual CPU mesh.

Note: this container's sitecustomize imports jax and pins the ``axon`` TPU
platform at interpreter start, so plain env vars are too late; we must go
through ``jax.config.update`` before the backend initializes. Set
``VIT_TPU_TEST_ON_TPU=1`` to run the suite on real hardware instead.
"""

import os

import jax

if os.environ.get("VIT_TPU_TEST_ON_TPU", "") in ("", "0"):
    jax.config.update("jax_platforms", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("VIT_TPU_INTERPRET", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
