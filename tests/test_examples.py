"""The educational example stays runnable (reference examples/ equivalent)."""

import runpy


def test_minimal_pallas_matmul_example():
    runpy.run_path("examples/minimal_pallas_matmul.py", run_name="__main__")
