"""Torch-reference interoperability (weight import)."""

from .torch_import import (import_torch_state_dict, import_torch_checkpoint,
                           supported_methods)

__all__ = ["import_torch_state_dict", "import_torch_checkpoint",
           "supported_methods"]
