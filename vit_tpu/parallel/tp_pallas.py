"""Tensor parallelism for the Pallas mega-kernel tier.

The XLA tier gets Megatron TP "for free": ``NamedSharding`` annotations on
the params and GSPMD inserts the collectives (vit_tpu/parallel/mesh.py).
``pallas_call`` is opaque to GSPMD, so here the same parallel decomposition
is written out explicitly under ``jax.shard_map`` — the scaling-book recipe
applied by hand:

- **Attention**: heads split over 'model'. Each shard runs
  :func:`vit_tpu.ops.pallas.block.attn_block_partial` — LN -> its
  ``heads/model`` QKV columns -> MHA -> its ``D/model`` output-projection
  rows — emitting a partial sum. ONE ``lax.psum`` per layer reduces it;
  the residual and output bias are added once, post-psum.
- **MLP**: fc1 column-split / fc2 row-split. Each shard runs
  ``mlp_block(..., partial_out=True)`` (zero-seeded accumulator, no
  residual / final bias) -> ``lax.psum`` -> residual + b2 once.
- LayerNorms, embeddings, final LN, classifier: replicated (computed
  redundantly per shard — standard Megatron; they are <1% of the FLOPs).

So an encoder layer costs exactly TWO psums over 'model' (the same
collective count GSPMD emits for the XLA tier), riding ICI, while the
matmuls and the attention core run inside the hand-tuned kernels at
1/model of the weight footprint — this is what lets H/14-class geometries
whose full-layer weights exceed the per-chip VMEM budget stay on the
mega-kernel tier instead of falling back (VERDICT r2 weak #7).

Layout precondition: the packed (D, 3D) QKV kernel is [q|k|v], so a
contiguous column slice mixes projections. :func:`prepare_tp_params`
repacks it head-major — [q_0|k_0|v_0 | q_1|k_1|v_1 | ...] per shard — so
the plain P(None, None, 'model') slice each shard receives is its own
[q_s|k_s|v_s]. Geometries whose local widths don't tile (e.g. dl % 128)
fall back to a composed jnp partial path per half — same math, same
collectives, XLA-compiled per shard.

Capability parity: reference vit/vit.py:66-112 attention/MLP semantics,
distributed the way its NCCL/torch counterpart would be on GPU — but as
mesh collectives, not point-to-point calls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vit_tpu.config import ViTConfig
from vit_tpu.models.vit import Params, embed
from vit_tpu.ops import reference
from vit_tpu.ops.dispatch import interpret_mode
from vit_tpu.ops.pallas import block as _blk
from vit_tpu.parallel.mesh import batch_sharding, param_shardings


def repack_qkv_headmajor(params: Params, model: int) -> Params:
    """Return params with the stacked QKV kernel/bias repacked head-major.

    (L, D, 3D) packed [q|k|v] -> [q_0|k_0|v_0 | ... | q_{m-1}|k_{m-1}|
    v_{m-1}] where shard s's block holds its D/model head columns of each
    projection — so a contiguous 'model' slice is a self-contained
    [q_s|k_s|v_s]. Identity for ``model == 1``. Pure relayout: the
    single-device forward on repacked params would be wrong; these params
    are for :func:`make_tp_forward` only.
    """
    if model == 1:
        return params

    def cols(a):  # repack a (..., 3D) trailing axis head-major
        *lead, d3 = a.shape
        dl = d3 // 3 // model
        a = a.reshape(*lead, 3, model, dl)
        perm = (*range(len(lead)), len(lead) + 1, len(lead), len(lead) + 2)
        return a.transpose(perm).reshape(*lead, d3)

    qkv = params["encoder"]["qkv"]
    kern = qkv["kernel"]
    if isinstance(kern, dict):  # int8 tier: {"q": (L,D,3D), "scale": (L,3D)}
        kern = {"q": cols(kern["q"]), "scale": cols(kern["scale"])}
    else:
        kern = cols(kern)
    out = dict(params)
    out["encoder"] = dict(params["encoder"])
    out["encoder"]["qkv"] = {"kernel": kern, "bias": cols(qkv["bias"])}
    return out


def prepare_tp_params(params: Params, cfg: ViTConfig, mesh: Mesh) -> Params:
    """Head-major-repacked params placed with the Megatron shardings."""
    params = repack_qkv_headmajor(params, mesh.shape["model"])
    return jax.device_put(params, param_shardings(params, mesh, cfg))


def _attn_partial_ref(x, lp, *, num_heads_local, head_dim, seq_len, eps):
    """Composed (jnp) fallback for the attention partial — same math as
    :func:`vit_tpu.ops.pallas.block.attn_block_partial` for geometries
    with no kernel plan (untiled local widths, tiny test configs)."""
    b, s, d = x.shape
    dl = num_heads_local * head_dim
    xn = reference.layernorm(x, lp["ln1"]["scale"], lp["ln1"]["bias"],
                             eps=eps)
    qkv = reference.matmul(xn, lp["qkv"]["kernel"], lp["qkv"]["bias"])
    qkv = qkv.reshape(b, s, 3, num_heads_local, head_dim)
    q, k, v = qkv.transpose(2, 0, 3, 1, 4)
    ctx = reference.attention(q, k, v, scale=head_dim ** -0.5,
                              seq_len=seq_len)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, dl)
    return reference.matmul(ctx, lp["out"]["kernel"])


def _mlp_partial_ref(x, lp, *, eps):
    """Composed (jnp) fallback for the MLP partial: fc2_s(gelu(fc1_s(LN(x))))
    without residual or b2."""
    h = reference.layernorm(x, lp["ln2"]["scale"], lp["ln2"]["bias"],
                            eps=eps)
    h = reference.matmul(h, lp["fc1"]["kernel"], lp["fc1"]["bias"], "gelu")
    return reference.matmul(h, lp["fc2"]["kernel"])


def _attn_partial_q_ref(x, lp, *, num_heads_local, head_dim, seq_len, eps):
    """Int8 composed fallback for the attention partial — the XLA quant
    tier's :func:`vit_tpu.quant.int8_matmul` numerics, shard form (no
    residual, no output bias)."""
    from vit_tpu.quant import int8_matmul

    b, s, d = x.shape
    dl = num_heads_local * head_dim
    xn = reference.layernorm(x, lp["ln1"]["scale"], lp["ln1"]["bias"],
                             eps=eps)
    qkv = int8_matmul(xn, lp["qkv"]["kernel"], lp["qkv"]["bias"])
    qkv = qkv.reshape(b, s, 3, num_heads_local, head_dim)
    q, k, v = qkv.transpose(2, 0, 3, 1, 4)
    ctx = reference.attention(q, k, v, scale=head_dim ** -0.5,
                              seq_len=seq_len)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, dl)
    return int8_matmul(ctx, lp["out"]["kernel"])


def _mlp_partial_q_ref(x, lp, *, eps):
    """Int8 composed fallback for the MLP partial (no residual, no b2)."""
    from vit_tpu.quant import int8_matmul

    h = reference.layernorm(x, lp["ln2"]["scale"], lp["ln2"]["bias"],
                            eps=eps)
    h = int8_matmul(h, lp["fc1"]["kernel"], lp["fc1"]["bias"], "gelu")
    return int8_matmul(h, lp["fc2"]["kernel"])


def make_tp_forward(cfg: ViTConfig, mesh: Mesh, *,
                    interpret: bool | None = None, jit: bool = True,
                    quant: bool = False):
    """Build the DPxTP forward for the pallas tier.

    Returns ``fn(tp_params, pixels)`` (jitted unless ``jit=False``) where
    ``tp_params`` came from :func:`prepare_tp_params` and ``pixels`` is
    (B, C, H, W) with B a multiple of the 'data' axis. Output matches the
    single-device :func:`vit_tpu.models.vit.forward` contract.

    ``quant=True``: the int8 tier — ``tp_params`` is a
    :func:`vit_tpu.quant.quantize_params` pytree (run through
    :func:`prepare_tp_params`, which head-major-repacks the int8 QKV and
    its scales). Each shard runs the int8 partial mega-kernels
    (s8 x s8 -> s32 dots, fp32 partial sums) and the same one-psum-per-
    half collective schedule; output matches the single-device
    :func:`vit_tpu.quant.forward_quant` to within activation-quant noise
    (the per-shard context rows are max-abs-scaled over dl columns
    instead of D).
    """
    import os

    model = mesh.shape["model"]
    assert cfg.num_heads % model == 0, (cfg.num_heads, model)
    assert cfg.mlp_dim % model == 0, (cfg.mlp_dim, model)
    nh_l = cfg.num_heads // model
    dl = nh_l * cfg.head_dim
    mlp_l = cfg.mlp_dim // model
    s = cfg.seq_len
    sp = -(-s // 16) * 16
    eps = cfg.layernorm_eps
    itemsize = jnp.dtype(cfg.dtype).itemsize

    def shard_fwd(params, px):
        interp = interpret_mode(interpret)
        x = embed(params, px, cfg)
        if x.shape[1] != sp:
            x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
        b = x.shape[0]
        # Static per-shape gates — identical on every shard (shapes are).
        if quant:
            attn_kernel = _blk.attn_block_q_partial_plan(
                b, sp, cfg.hidden_dim, dl, itemsize) is not None
            mlp_kernel = _blk.mlp_block_plan_i8(
                b * sp, cfg.hidden_dim, mlp_l, itemsize) is not None
            i8dot = os.environ.get("VIT_TPU_INT8_DOT") != "0"
        else:
            attn_kernel = _blk.attn_block_partial_plan(
                b, sp, cfg.hidden_dim, dl, itemsize) is not None
            mlp_kernel = _blk.mlp_block_plan(
                b * sp, cfg.hidden_dim, mlp_l, itemsize) is not None

        def attn_partial(x, lp):
            if quant and attn_kernel:
                kq, ko = lp["qkv"]["kernel"], lp["out"]["kernel"]
                return _blk.attn_block_q_partial(
                    x, lp["ln1"]["scale"], lp["ln1"]["bias"],
                    kq["q"], kq["scale"], lp["qkv"]["bias"],
                    ko["q"], ko["scale"], num_heads=nh_l,
                    scale=cfg.head_dim ** -0.5, seq_len=s, eps=eps,
                    interpret=interp)
            if quant:
                return _attn_partial_q_ref(x, lp, num_heads_local=nh_l,
                                           head_dim=cfg.head_dim,
                                           seq_len=s, eps=eps)
            if attn_kernel:
                return _blk.attn_block_partial(
                    x, lp["ln1"]["scale"], lp["ln1"]["bias"],
                    lp["qkv"]["kernel"], lp["qkv"]["bias"],
                    lp["out"]["kernel"], num_heads=nh_l,
                    scale=cfg.head_dim ** -0.5, seq_len=s, eps=eps,
                    interpret=interp)
            return _attn_partial_ref(x, lp, num_heads_local=nh_l,
                                     head_dim=cfg.head_dim, seq_len=s,
                                     eps=eps)

        def mlp_partial(x, lp):
            if quant and mlp_kernel:
                k1, k2 = lp["fc1"]["kernel"], lp["fc2"]["kernel"]
                kern = _blk.mlp_block_i8dot if i8dot else _blk.mlp_block_q
                return kern(
                    x, lp["ln2"]["scale"], lp["ln2"]["bias"],
                    k1["q"], k1["scale"], lp["fc1"]["bias"],
                    k2["q"], k2["scale"], lp["fc2"]["bias"], eps=eps,
                    interpret=interp, partial_out=True)
            if quant:
                return _mlp_partial_q_ref(x, lp, eps=eps)
            if mlp_kernel:
                return _blk.mlp_block(
                    x, lp["ln2"]["scale"], lp["ln2"]["bias"],
                    lp["fc1"]["kernel"], lp["fc1"]["bias"],
                    lp["fc2"]["kernel"], lp["fc2"]["bias"], eps=eps,
                    interpret=interp, partial_out=True)
            return _mlp_partial_ref(x, lp, eps=eps)

        def body(x, lp):
            y = jax.lax.psum(attn_partial(x, lp), "model")
            x = x + y + lp["out"]["bias"].astype(x.dtype)
            z = jax.lax.psum(mlp_partial(x, lp), "model")
            x = x + z + lp["fc2"]["bias"].astype(x.dtype)
            return x, None

        x, _ = jax.lax.scan(body, x, params["encoder"])
        x = reference.layernorm(x, params["ln_final"]["scale"],
                                params["ln_final"]["bias"],
                                eps=eps)
        if sp != s:
            x = x[:, :s]
        if cfg.num_classes:
            pooled = (x[:, 0] if cfg.pooling in ("none", "cls")
                      else jnp.mean(x, axis=1))
            c = params["classifier"]
            return reference.matmul(pooled[:, None, :], c["kernel"],
                                    c["bias"])[:, 0]
        if cfg.pooling == "cls":
            return x[:, 0]
        if cfg.pooling == "mean":
            return jnp.mean(x, axis=1)
        return x

    # Param in_specs: the same Megatron rules the XLA tier's NamedShardings
    # encode, as raw PartitionSpecs (shard_map slices them explicitly).
    def pspecs(params):
        return jax.tree.map(
            lambda ns: ns.spec, param_shardings(params, mesh, cfg),
            is_leaf=lambda x: hasattr(x, "spec"))

    def fwd(params, px):
        f = jax.shard_map(
            shard_fwd, mesh=mesh,
            in_specs=(pspecs(params), P("data")),
            out_specs=P("data"),
            check_vma=False)  # pallas_call carries no vma info
        return f(params, px)

    return jax.jit(fwd) if jit else fwd


def tp_batch_sharding(mesh: Mesh):
    """Input placement for :func:`make_tp_forward` (alias of the mesh
    module's batch rule — leading axis over 'data', replicated over
    'model')."""
    return batch_sharding(mesh)
