"""Device-mesh construction and sharding specs.

The reference is single-GPU on its main path (SURVEY.md §2.2); its only
multi-GPU story is example-level torch DDP. Here scale-out is
first-class: a 2-D ``(data, group)`` mesh where

* ``data`` shards training batches / fragment-pair work (DP),
* ``group`` shards the 60-element rotation axis (the SP/TP analog —
  group-feature tensors are (B, 60, C) and the lifting is
  embarrassingly parallel over rotations).

XLA inserts the collectives: the 13-neighbor group gather across a
sharded group axis becomes an all-gather over ICI; the batch-hard loss
distance matrix psums over ``data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_group: int = 1,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_group
    assert n_data * n_group == n, f"{n_data}x{n_group} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_group)
    return Mesh(arr, axis_names=("data", "group"))


def part1_batch_sharding(mesh: Mesh) -> dict:
    """Shardings for a PartI training batch: batch over data, rotation
    axis over group."""
    s = NamedSharding(mesh, P("data", "group", None))
    return {
        "feats0": s,
        "feats1": s,
        "true_idx": NamedSharding(mesh, P("data")),
    }


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, shardings: dict) -> dict:
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
