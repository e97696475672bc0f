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

#: Tests measured >=~4 s on a 1-CPU container (full suite ~13 min serial;
#: `pytest -m "not slow"` keeps a <5-min default profile — measured 4m45
#: round-4). Every subsystem these cover also has fast tests that stay in
#: the default profile; the slow ones are the full-size / golden / mesh /
#: grad-through-interpret variants. Regenerate with `pytest -q
#: --durations=0` and update this set.
SLOW_TESTS = {
    "test_forward_quant_pallas_stack_route",
    "test_int8_tp_forward_matches_single_device",
    "test_mesh_multibucket_single_dispatch",
    "test_model_routes_stacked_scan",
    "test_params_from_safetensors_matches_torch_path",
    "test_stacked_blocks_grads_match_xla",
    "test_stacked_blocks_match_sliced_scan",
    "test_stacked_int8_blocks_match_sliced_scan",
    "test_tp_pallas_quant_kernel_path_matches",
    "test_attn_block_grads_match_xla",
    "test_attn_block_q_interpret_matches_int8_chain",
    "test_bench_serving_tiny",
    "test_bf16_forward_close_to_fp32_oracle",
    "test_block_model_forward_matches_unfused",
    "test_classify_example_offline",
    "test_deit_pallas_interpret_matches_xla",
    "test_dp_forward_matches_single_device",
    "test_encoder_stack_grads_match_xla",
    "test_encoder_stack_q_interpret_matches_dequant",
    "test_flash_attention_grads_match_oracle",
    "test_forward_quant_golden_b16",
    "test_forward_quant_pallas_impl_matches_xla_mlp_dequant",
    "test_fused_linear_grads_match_oracle",
    "test_golden_end_to_end",
    "test_graft_entry_multichip",
    "test_layer_block_grad_matches_composed",
    "test_matmul3_softmax_add_grads_match_oracle",
    "test_mlp_block_grads_match_xla",
    "test_mlp_block_q_interpret_matches_dequant",
    "test_model_embed_fused_matches_composed",
    "test_model_forward_pallas_grads_match_xla",
    "test_model_fused_equals_unfused",
    "test_model_routes_layer_block_when_forced",
    "test_one_sided_mega_routing",
    "test_ops_matmul_pallas_dispatch_is_differentiable",
    "test_pallas_b16_geometry_jit",
    "test_quant_accuracy_report_flip_rate_and_smoothquant_win",
    "test_quant_predictor_mesh_pallas_mega_kernels",
    "test_sharded_orbax_roundtrip",
    "test_smooth_params_is_float_identity_and_helps_int8",
    "test_tp_forward_matches_single_device",
    "test_train_state_checkpoint_on_mesh",
    "test_train_state_resume_is_deterministic",
    "test_train_step_on_mesh",
    "test_train_step_pallas_dp_on_mesh",
    "test_train_step_pallas_impl",
    "test_train_tiny_example_converges",
    "test_variant_forward_xla",
    "test_variant_pallas_matches_xla",
    "test_vit_b16_full_size_parity",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
