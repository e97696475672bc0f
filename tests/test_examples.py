"""The educational examples stay runnable (reference examples/ equivalent)."""

import runpy
import sys

import numpy as np


def test_minimal_pallas_matmul_example():
    runpy.run_path("examples/minimal_pallas_matmul.py", run_name="__main__")


def test_classify_example_offline(tmp_path, capsys, monkeypatch):
    # Full pipeline (load -> preprocess -> jit forward -> top-k) on a random
    # head and an .npy image, no network and no PIL needed.
    img = (np.random.default_rng(0)
           .integers(0, 256, (300, 260, 3)).astype(np.uint8))
    path = tmp_path / "img.npy"
    np.save(path, img)
    monkeypatch.setattr(sys, "argv", [
        "classify.py", str(path), "--random-init", "--num-classes", "16",
        "--top", "3"])
    runpy.run_path("examples/classify.py", run_name="__main__")
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3
    probs = [float(line.split()[0]) for line in out]
    assert all(0.0 <= p <= 1.0 for p in probs)
    assert probs == sorted(probs, reverse=True)


def test_train_tiny_example_converges(capsys, monkeypatch):
    # The training tier actually learns: loss drops ~2 orders of magnitude
    # and the tiny ViT fits the synthetic training set.
    monkeypatch.setattr(sys, "argv", [
        "train_tiny.py", "--steps", "40", "--log-every", "40"])
    mod = runpy.run_path("examples/train_tiny.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "train accuracy" in out
    final = out.strip().splitlines()[-1]
    acc = float(final.split("accuracy")[1].strip().rstrip("%")) / 100
    assert acc >= 0.95, final
