"""Record the golden fixture: synthetic HF checkpoint -> torch ViTModel ->
reference hidden states.

Run ONCE (committed fixture: tests/fixtures/golden_b16.npz):
    python tools/record_golden.py

The ground truth comes from the REAL ``transformers`` torch implementation
(the same oracle the reference's notebook 02 used with the real
google/vit-base-patch16-224 weights — reference vit/vit.py:273). The test
(tests/test_golden.py) replays our safetensors import path + JAX forward
against this recording WITHOUT needing torch/transformers installed.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vit_tpu.config import ViTConfig
from vit_tpu.weights.synthetic import golden_pixels, synthetic_hf_state_dict

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "golden_b16.npz")


def main():
    import torch
    import transformers
    from transformers import ViTConfig as HFViTConfig, ViTModel

    cfg = ViTConfig()  # B/16 fp32, the reference's model
    hf_cfg = HFViTConfig(hidden_size=cfg.hidden_dim,
                         num_hidden_layers=cfg.num_layers,
                         num_attention_heads=cfg.num_heads,
                         intermediate_size=cfg.mlp_dim,
                         image_size=cfg.image_size,
                         patch_size=cfg.patch_size,
                         layer_norm_eps=cfg.layernorm_eps,
                         hidden_act="gelu")
    model = ViTModel(hf_cfg, add_pooling_layer=False).eval()

    sd = {k: torch.from_numpy(v) for k, v in synthetic_hf_state_dict(cfg).items()}
    missing, unexpected = model.load_state_dict(sd, strict=True), None
    pixels = torch.from_numpy(golden_pixels(cfg))
    with torch.no_grad():
        out = model(pixels, output_hidden_states=True)

    hidden = out.last_hidden_state.numpy().astype(np.float32)
    # Also pin one mid-stack layer (pre-final-LN) to localize regressions.
    mid = out.hidden_states[cfg.num_layers // 2].numpy().astype(np.float32)

    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(
        FIXTURE,
        final_hidden=hidden,
        mid_hidden=mid,
        mid_layer=np.int32(cfg.num_layers // 2),
        weights_seed=np.int32(1234),
        pixels_seed=np.int32(4321),
        transformers_version=np.bytes_(transformers.__version__),
        torch_version=np.bytes_(torch.__version__),
    )
    print(f"wrote {os.path.abspath(FIXTURE)}"
          f" final_hidden{hidden.shape} |mean|={np.abs(hidden).mean():.4f}")


if __name__ == "__main__":
    main()
