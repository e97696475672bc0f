"""Autotune table: record/lookup round trip + kernel consultation."""

import jax.numpy as jnp
import pytest

from vit_tpu.ops.pallas import tuning
from vit_tpu.ops.pallas.matmul import _pick_blocks


@pytest.fixture
def tmp_table(tmp_path, monkeypatch):
    path = str(tmp_path / "tuned.json")
    monkeypatch.setattr(tuning, "_PATH", path)
    tuning._load_cached.cache_clear()
    yield path
    tuning._load_cached.cache_clear()


def test_record_lookup_roundtrip(tmp_table):
    assert tuning.lookup("matmul", jnp.bfloat16, (64, 128, 256)) is None
    tuning.record("matmul", jnp.bfloat16, (64, 128, 256),
                  {"bm": 64, "bn": 128, "bk": 256}, extra={"ms": 0.1})
    hit = tuning.lookup("matmul", jnp.bfloat16, (64, 128, 256))
    assert hit["bm"] == 64 and hit["_meta"]["ms"] == 0.1
    # dtype is part of the key
    assert tuning.lookup("matmul", jnp.float32, (64, 128, 256)) is None


def test_wildcard_leading_dim(tmp_table):
    tuning.record("matmul", jnp.bfloat16, (0, 128, 256), {"bm": 512,
                                                          "bn": 128,
                                                          "bk": 256})
    hit = tuning.lookup("matmul", jnp.bfloat16, (9999, 128, 256))
    assert hit["bm"] == 512
    # exact beats wildcard
    tuning.record("matmul", jnp.bfloat16, (9999, 128, 256), {"bm": 256,
                                                             "bn": 128,
                                                             "bk": 128})
    assert tuning.lookup("matmul", jnp.bfloat16, (9999, 128, 256))["bm"] == 256


def test_pick_blocks_consults_table_and_clamps(tmp_table):
    tuning.record("matmul", jnp.bfloat16, (0, 768, 768),
                  {"bm": 1024, "bn": 768, "bk": 768})
    # m smaller than the tuned bm: clamp to round_up(m, 128)
    bm, bn, bk = _pick_blocks(208, 768, 768, 2)
    assert (bm, bn, bk) == (256, 768, 768)
    # bk not dividing k: table entry rejected, heuristics take over
    bm2, bn2, bk2 = _pick_blocks(208, 768, 1024, 2)
    assert 1024 % bk2 == 0


def test_pick_blocks_heuristic_vmem_bound():
    # No table: heuristic picks must keep the live-VMEM estimate sane.
    for m, n, k, it in [(6656, 3072, 768, 2), (6656, 768, 3072, 4),
                        (208, 2304, 768, 2), (4096, 4096, 4096, 4)]:
        bm, bn, bk = _pick_blocks(m, n, k, it)
        assert k % bk == 0
        live = 2 * (bm * bk + bk * bn) * it + bm * bn * (4 + 2 * it)
        assert live < 12 * 2**20, (m, n, k, it, bm, bn, bk, live)


def test_forget_drops_entry(tmp_table):
    tuning.record("layerblock", jnp.bfloat16, (32, 208, 768, 3072, 12),
                  {"group": 1, "ct": 512})
    assert tuning.lookup("layerblock", jnp.bfloat16,
                         (32, 208, 768, 3072, 12)) is not None
    tuning.forget("layerblock", jnp.bfloat16, (32, 208, 768, 3072, 12))
    assert tuning.lookup("layerblock", jnp.bfloat16,
                         (32, 208, 768, 3072, 12)) is None
    # forgetting a missing key is a no-op
    tuning.forget("layerblock", jnp.bfloat16, (1, 2, 3))


def test_rev_stamp_and_invalidate(tmp_table):
    """Entries self-invalidate when the kernel-body source changes
    (round-4 §5b: Mosaic plans are valid per kernel revision): ``record``
    stamps the live rev, a mismatched or missing rev is a lookup MISS,
    and unregistered ops are exempt."""
    dims = (32, 208, 768, 12)
    tuning.record("attnblock", jnp.bfloat16, dims,
                  {"layout": "mstream", "group": 4})
    live = tuning.rev("attnblock")
    assert live is not None and len(live) == 10
    raw = tuning.table()[tuning.key("attnblock", jnp.bfloat16, dims)]
    assert raw["rev"] == live
    assert tuning.lookup("attnblock", jnp.bfloat16, dims) is not None
    # Simulate a kernel edit: entry stamped for another revision -> miss.
    import json
    t = dict(tuning.table())
    t[tuning.key("attnblock", jnp.bfloat16, dims)] = dict(
        raw, rev="0000000000")
    with open(tuning._PATH, "w") as f:
        json.dump(t, f)
    tuning._load_cached.cache_clear()
    assert tuning.lookup("attnblock", jnp.bfloat16, dims) is None
    # Legacy entry with NO rev field: also a miss for registered ops.
    t[tuning.key("attnblock", jnp.bfloat16, dims)] = {
        k: v for k, v in raw.items() if k != "rev"}
    with open(tuning._PATH, "w") as f:
        json.dump(t, f)
    tuning._load_cached.cache_clear()
    assert tuning.lookup("attnblock", jnp.bfloat16, dims) is None
    # Unregistered op: no rev gate.
    tuning.record("someop", jnp.bfloat16, (1, 2), {"x": 1})
    assert tuning.lookup("someop", jnp.bfloat16, (1, 2))["x"] == 1


def test_rev_tracks_kernel_source():
    """rev() hashes the registered kernel sources — two ops sharing the
    same source list hash identically; every registered op resolves."""
    assert tuning.rev("flash") == tuning.rev("flash3d")
    revs = {op: tuning.rev(op) for op in tuning._REV_SOURCES}
    assert all(r is not None for r in revs.values())
    # distinct kernels hash distinctly
    assert revs["encstack"] != revs["encstackq"]
    assert tuning.rev("not_an_op") is None


def test_encoder_stack_plan_q_routes(tmp_table):
    """The int8 tier's stack gate (round-4): a recorded encstackq entry IS
    the routing decision — "layers" returns None (per-layer stacked int8
    kernels), a (cq, mt) entry pins the stack plan; no entry falls back to
    the float planner."""
    from vit_tpu.ops.pallas.block import (encoder_stack_plan,
                                          encoder_stack_plan_q)

    dims = (1, 208, 768, 3072, 12)
    # No entry: mirrors the float plan (same gate, same heuristic).
    assert (encoder_stack_plan_q(*dims, 2)
            == encoder_stack_plan(*dims, 2))
    tuning.record("encstackq", jnp.bfloat16, dims, {"route": "layers"})
    assert encoder_stack_plan_q(*dims, 2) is None
    tuning.record("encstackq", jnp.bfloat16, dims, {"cq": 2304, "mt": 768})
    plan = encoder_stack_plan_q(*dims, 2)
    assert plan["cq"] == 2304 and plan["mt"] == 768 and plan["nq"] == 1
    # An infeasible recorded plan falls back to the float planner.
    tuning.record("encstackq", jnp.bfloat16, dims, {"cq": 100, "mt": 100})
    assert (encoder_stack_plan_q(*dims, 2)
            == encoder_stack_plan(*dims, 2))
