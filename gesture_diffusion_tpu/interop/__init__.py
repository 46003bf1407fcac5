"""Interop with the reference PyTorch framework (checkpoint import)."""

from .torch_import import import_glide_unet_state_dict, import_torch_state_dict

__all__ = ["import_glide_unet_state_dict", "import_torch_state_dict"]
