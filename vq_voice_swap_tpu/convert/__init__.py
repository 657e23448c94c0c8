from .torch_import import convert_state_dict, convert_torch_checkpoint

__all__ = ["convert_state_dict", "convert_torch_checkpoint"]
