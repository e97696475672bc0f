"""Checkpoint save/load for converted params.

The reference has no save path of its own — its only persistence is the
one-way HF->custom transfer re-run on every process start (SURVEY.md §5
"Checkpoint/resume: import-only"). Here converted params are first-class:

- :func:`save_params` / :func:`load_params` — the framework's own format:
  one ``.safetensors`` file of flattened leaves + a tiny JSON config
  sidecar. Loads are zero-copy-ish (numpy-mapped) and go through the same
  zero-scan verification as HF imports.
- :func:`params_from_safetensors` — import weights straight from an HF
  ``model.safetensors`` file (the on-disk layout of every modern HF
  checkpoint) without instantiating a torch model.
- :func:`load_or_convert` — the cache pattern: convert from HF once, reuse
  the converted artifact afterwards (the reference re-splits q/k/v on every
  run, reference vit/utils.py:45-113).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from safetensors.numpy import load_file, save_file

from vit_tpu.config import ViTConfig
from vit_tpu.models.vit import Params
from vit_tpu.weights.hf import params_from_state_dict, verify_params

_SEP = "::"


def _flatten(params: Params) -> dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        out[key] = np.asarray(jax.device_get(leaf))
    return out


def _unflatten(flat: Mapping[str, np.ndarray], dtype) -> Params:
    params: dict = {}
    for key, arr in flat.items():
        node = params
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        # Float leaves adopt the config dtype; integer leaves (int8
        # quantized weights) and quantization scales (always fp32 — a bf16
        # config must not degrade them) keep their stored dtype.
        keep = (not np.issubdtype(arr.dtype, np.floating)
                or parts[-1] == "scale" and "kernel" in parts)
        node[parts[-1]] = jnp.asarray(arr) if keep else jnp.asarray(arr, dtype)
    return params


def save_params(path: str, params: Params, cfg: ViTConfig) -> None:
    """Write ``<path>.safetensors`` + ``<path>.json`` (config sidecar)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    save_file(_flatten(params), path + ".safetensors")
    meta = dataclasses.asdict(cfg)
    meta["dtype"] = jnp.dtype(cfg.dtype).name
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)


def load_params(path: str) -> tuple[Params, ViTConfig]:
    """Load a :func:`save_params` artifact; verified with the zero-scan."""
    with open(path + ".json") as f:
        meta = json.load(f)
    meta["dtype"] = jnp.dtype(meta["dtype"])
    cfg = ViTConfig(**meta)
    params = _unflatten(load_file(path + ".safetensors"), cfg.dtype)
    verify_params(params)
    return params, cfg


def params_from_safetensors(st_path: str, cfg: ViTConfig) -> Params:
    """Import an HF ``model.safetensors`` checkpoint file directly.

    Same mapping/verification as :func:`vit_tpu.weights.params_from_hf`, no
    torch required.
    """
    return params_from_state_dict(load_file(st_path), cfg)


def load_or_convert(cache_path: str, convert: Callable[[], tuple[Params, ViTConfig]]
                    ) -> tuple[Params, ViTConfig]:
    """Load the converted-params cache, or build + populate it."""
    if os.path.exists(cache_path + ".safetensors"):
        return load_params(cache_path)
    params, cfg = convert()
    save_params(cache_path, params, cfg)
    return params, cfg


def save_sharded(path: str, params: Params, cfg: ViTConfig) -> None:
    """Orbax checkpoint of (possibly sharded) params — each device writes
    its own shards, so this scales to multi-host meshes (the single-file
    safetensors path gathers everything to one host)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path + ".orbax", params)
    meta = dataclasses.asdict(cfg)
    meta["dtype"] = jnp.dtype(cfg.dtype).name
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)


def save_train_state(path: str, params: Params, opt_state, step: int) -> None:
    """Orbax checkpoint of a full training state (params + optimizer state +
    step counter) — the resume side of the training tier. The reference is
    inference-only with no save path at all (SURVEY.md §5 checkpoint row);
    this is the TPU-native equivalent done properly: one composite pytree,
    per-device shard writes, restores onto any mesh via ``like`` shardings."""
    import orbax.checkpoint as ocp

    state = {"params": params, "opt_state": opt_state,
             "step": jnp.asarray(step, jnp.int32)}
    with ocp.StandardCheckpointer() as ckptr:
        # force: a training checkpoint is a rolling save — overwrite.
        ckptr.save(os.path.abspath(path) + ".orbax", state, force=True)


def restore_train_state(path: str, like):
    """Restore ``(params, opt_state, step)`` saved by :func:`save_train_state`.

    ``like = (params, opt_state)`` supplies the target structure: shapes,
    dtypes, and — when the arrays are sharded — placements, so each device
    reads only its own shards."""
    import orbax.checkpoint as ocp

    state_like = {"params": like[0], "opt_state": like[1],
                  "step": jnp.zeros((), jnp.int32)}
    # Committed-ness subtlety: jit outputs (e.g. optax init state) carry an
    # UNCOMMITTED SingleDeviceSharding that mixes freely with mesh-sharded
    # params inside jit — but a restored array is always committed, and a
    # committed single-device scalar conflicts with the mesh. Restore such
    # leaves replicated over the like tree's mesh (no-op without a mesh).
    from jax.sharding import NamedSharding, PartitionSpec
    meshes = {l.sharding.mesh for l in jax.tree.leaves(state_like)
              if isinstance(getattr(l, "sharding", None), NamedSharding)}
    mesh = meshes.pop() if len(meshes) == 1 else None

    def _target(a):
        s = getattr(a, "sharding", None)
        if mesh is not None and not isinstance(s, NamedSharding):
            s = NamedSharding(mesh, PartitionSpec())
        return jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a),
                                    sharding=s)

    target = jax.tree.map(_target, state_like)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(path) + ".orbax", target)
    return state["params"], state["opt_state"], int(state["step"])


def load_sharded(path: str, shardings: Params | None = None
                 ) -> tuple[Params, ViTConfig]:
    """Restore an orbax checkpoint; with a ``shardings`` pytree (matching
    the params structure, e.g. from vit_tpu.parallel.param_shardings) each
    device reads only its own shards and the result is already placed."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(path + ".json") as f:
        meta = json.load(f)
    meta["dtype"] = jnp.dtype(meta["dtype"])
    cfg = ViTConfig(**meta)
    with ocp.StandardCheckpointer() as ckptr:
        if shardings is None:
            params = ckptr.restore(path + ".orbax")
        else:
            from vit_tpu.models.vit import init_params
            abstract = jax.eval_shape(
                lambda: init_params(jax.random.key(0), cfg))
            target = jax.tree.map(
                lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                                  sharding=s),
                abstract, shardings)
            params = ckptr.restore(path + ".orbax", target)
    verify_params(params)
    return params, cfg
