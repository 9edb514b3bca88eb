from .io import save_checkpoint, load_checkpoint, checkpoint_path
from .pth_import import import_pth, load_state_dict

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "checkpoint_path",
    "import_pth",
    "load_state_dict",
]
