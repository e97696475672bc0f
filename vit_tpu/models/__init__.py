"""Model graphs (the reference's L2 tier, vit/vit.py, rebuilt functionally)."""

from vit_tpu.models.vit import forward, init_params, make_forward

__all__ = ["forward", "init_params", "make_forward"]
