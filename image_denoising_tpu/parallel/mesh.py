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

import math
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
    """Put a host array (or pytree of them) with the batch dim sharded.

    When the batch size does not divide the mesh (the reference's default
    batch of 4 — ``train.py:33`` — on an 8-device mesh), the devices are
    regrouped into a (gcd, rest) sub-mesh: the batch shards over ``gcd``
    device groups and replicates within each group. Computation is exact
    (SPMD replication, not padding) at the cost of redundant FLOPs on the
    replica ranks — the degenerate gcd==1 case is plain full replication.
    All leaves must share the same leading batch dimension.
    """
    leaves = jax.tree_util.tree_leaves(batch)
    assert leaves, "empty batch"
    b = int(np.shape(leaves[0])[0])
    for leaf in leaves[1:]:
        assert int(np.shape(leaf)[0]) == b, "batch leaves disagree on leading dim"
    n_dev = int(mesh.devices.size)
    if b % n_dev == 0:
        sh = data_sharding(mesh, axis_name)
    else:
        g = math.gcd(b, n_dev)
        sub = Mesh(
            mesh.devices.reshape(g, n_dev // g),
            (axis_name, f"{axis_name}_replica"),
        )
        sh = NamedSharding(sub, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
