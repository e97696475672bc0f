"""Weight import (the reference's L3 tier: vit/load_weights.py, vit/utils.py:45-113)."""

from vit_tpu.weights.hf import (
    config_from_hf,
    params_from_hf,
    params_from_state_dict,
    verify_params,
)

__all__ = [
    "config_from_hf",
    "params_from_hf",
    "params_from_state_dict",
    "verify_params",
]
