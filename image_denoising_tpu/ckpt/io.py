"""Native checkpoint save/load.

Reproduces the reference's four checkpoint roles (SURVEY.md §5):
``epoch_model_XXX`` (A-domain trainer), ``epoch_final_XXX`` (HPO retrain),
``epoch_adapter_XXX`` (full base+adapter wrapper), ``epoch_adapter_only_XXX``
(adapter submodule only) — as msgpack-serialized flax pytrees with a ``.ckpt``
extension. ``load_checkpoint`` also accepts reference ``.pth`` files and
converts them via the import shim, so reference users can point our eval CLIs
at their existing torch checkpoints.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization

__all__ = ["checkpoint_path", "save_checkpoint", "load_checkpoint"]


def checkpoint_path(save_root: str, role: str, epoch: int) -> str:
    return os.path.join(save_root, f"epoch_{role}_{epoch:03d}.ckpt")


def save_checkpoint(params: Any, save_root: str, role: str, epoch: int,
                    meta: Optional[Dict[str, Any]] = None) -> str:
    """Serialize a params pytree; returns the written path."""
    os.makedirs(save_root, exist_ok=True)
    path = checkpoint_path(save_root, role, epoch)
    params = np_tree(params)
    payload = serialization.msgpack_serialize(params)
    with open(path, "wb") as f:
        f.write(payload)
    if meta:
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=2, default=str)
    print(f"Checkpoint saved to {path}")
    return path


def np_tree(tree: Any) -> Any:
    """Convert a pytree of jax/np arrays into plain numpy (host)."""
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def load_checkpoint(path: str, arch: Optional[str] = None, **kwargs) -> Any:
    """Load a .ckpt (msgpack pytree) or a reference .pth (needs ``arch``)."""
    if path.endswith(".pth"):
        from .pth_import import import_pth

        if arch is None:
            raise ValueError("loading a .pth checkpoint requires arch=")
        return import_pth(path, arch, **kwargs)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_train_state(state, save_root: str, epoch: int) -> str:
    """Full-state checkpoint (params + optimizer moments + counters) for true
    resume — an extension: the reference never persists optimizer state
    (SURVEY.md §5 checkpoint/resume), so its restarts begin at epoch 1.
    """
    os.makedirs(save_root, exist_ok=True)
    path = os.path.join(save_root, f"train_state_{epoch:03d}.ckpt")
    payload = serialization.to_bytes(np_tree_state(state))
    with open(path, "wb") as f:
        f.write(payload)
    print(f"Full train state saved to {path}")
    return path


def np_tree_state(state) -> Any:
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), state)


def restore_train_state(state_template, path: str):
    """Restore into a freshly-constructed TrainState of identical structure."""
    with open(path, "rb") as f:
        return serialization.from_bytes(state_template, f.read())
