"""Device mesh + sharding helpers (SPMD data parallelism over ICI).

The reference's only parallelism is single-process ``nn.DataParallel``
(``train.py:324-326``) — CUDA scatter/gather with no process groups. The
TPU-native replacement is SPMD: one jitted step, batch sharded over a 1-D
``data`` mesh axis, params replicated; XLA inserts the gradient all-reduce
(psum) over ICI automatically because the loss is a mean over the global
batch. Checkpoints are stored unreplicated, so there is no ``module.`` prefix
analog to strip.

Tile parallelism for huge-frame inference reuses the same mesh: the tile batch
dimension of the tiled evaluators shards over ``data`` (a context/sequence-
parallel analog — SURVEY.md §5 long-context).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "shard_batch", "replicate"]


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding spec (leading axis split over the mesh)."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Put a host array (or pytree of them) with the batch dim sharded."""
    sh = data_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
