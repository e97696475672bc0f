"""Native C++ tier: build, ctypes round trip, XLA FFI custom call."""

import numpy as np
import pytest

from vit_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    native.ensure_built()


def test_standalone_demo_binary():
    # The reference example's alloc/run/verify round trip
    # (reference examples/matmul_batch.cu) as a binary exit code.
    import os
    import subprocess

    subprocess.run(["make", "-C", native._NATIVE_DIR, "matmul_batch"],
                   check=True, capture_output=True)
    out = subprocess.run(
        [os.path.join(native._NATIVE_DIR, "matmul_batch")],
        check=True, capture_output=True, text=True)
    assert "PASSED" in out.stdout


def test_ctypes_shared_weight(rng):
    a = rng.standard_normal((4, 197, 768)).astype(np.float32)
    b = rng.standard_normal((768, 64)).astype(np.float32)
    got = native.matmul_batch_np(a, b)
    np.testing.assert_allclose(got, a @ b, atol=1e-3)


def test_ctypes_batched_weight(rng):
    a = rng.standard_normal((4, 64, 128)).astype(np.float32)
    b = rng.standard_normal((4, 128, 96)).astype(np.float32)
    got = native.matmul_batch_np(a, b)
    np.testing.assert_allclose(got, a @ b, atol=1e-3)


def test_xla_ffi_custom_call(rng):
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((128, 96)), jnp.float32)
    got = jax.jit(native.matmul_batch_jax)(a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(a @ b), atol=1e-3)
