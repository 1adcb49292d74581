"""User-facing SparseTensor API — the ``ME.SparseTensor`` analog.

A thin object wrapper over (SparseGrid, features) with the operations a
MinkowskiEngine user expects (reference
``MinkowskiSparseTensor.py:48-736``): ``.F``/``.C``/``.D``,
``dense()``, ``features_at_coordinates``, pooling/pruning/union ops,
plus construction from raw points via quantization. The object is a
registered JAX pytree, so it can flow through jit/vmap; all compute is
delegated to the functional ``ops`` layer.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from yoho_tpu.ops import sparse_ops
from yoho_tpu.ops.kernel_map import build_kernel_map
from yoho_tpu.ops.voxel import SparseGrid, build_grid, quantize, stride_grid, unique_voxels


@jax.tree_util.register_pytree_node_class
@dataclass
class SparseTensor:
    grid: SparseGrid
    feats: jnp.ndarray

    # -- pytree protocol --
    def tree_flatten(self):
        return (self.grid, self.feats), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- ME-style accessors --
    @property
    def F(self) -> jnp.ndarray:  # noqa: N802 — ME naming
        return self.feats

    @property
    def C(self) -> jnp.ndarray:  # noqa: N802
        return self.grid.coords

    @property
    def D(self) -> int:  # noqa: N802
        return 3

    @property
    def tensor_stride(self) -> int:
        return self.grid.stride

    @property
    def count(self):
        return self.grid.count

    @property
    def mask(self) -> jnp.ndarray:
        return jnp.arange(self.grid.coords.shape[0]) < self.grid.count

    # -- constructors --
    @classmethod
    def from_points(
        cls,
        points: jnp.ndarray,
        feats: jnp.ndarray,
        voxel_size: float,
        num_valid,
        batch_index: int = 0,
    ) -> "SparseTensor":
        """Quantize points; per-voxel feature = first occurrence
        (ME ``RANDOM_SUBSAMPLE``-style quantization mode)."""
        grid, first = build_grid(points, voxel_size, num_valid, batch_index)
        return cls(grid, feats[first] * (jnp.arange(grid.coords.shape[0]) < grid.count)[:, None])

    # -- ops --
    def stride(self, factor: int = 2) -> "SparseTensor":
        coarse, parent = stride_grid(self.grid, factor)
        kmap = build_kernel_map(self.grid, coarse, 1)
        # stride with kernel 1 keeps the representative voxel's features;
        # use pool() for reductions over the footprint.
        f = sparse_ops.local_pool(self.feats, kmap, mode="sum")
        return SparseTensor(coarse, f)

    def pool(self, kernel_size: int = 2, mode: str = "max", factor: int = 2) -> "SparseTensor":
        coarse, _ = stride_grid(self.grid, factor)
        kmap = build_kernel_map(self.grid, coarse, kernel_size + (kernel_size + 1) % 2)
        return SparseTensor(coarse, sparse_ops.local_pool(self.feats, kmap, mode))

    def global_pool(self, num_batches: int = 1, mode: str = "avg") -> jnp.ndarray:
        return sparse_ops.global_pool(
            self.feats, self.grid.coords[:, 0], self.mask, num_batches, mode
        )

    def broadcast(self, batch_vec: jnp.ndarray, op: str = "add") -> "SparseTensor":
        return SparseTensor(
            self.grid,
            sparse_ops.broadcast(self.feats, self.grid.coords[:, 0], batch_vec, op),
        )

    def prune(self, keep: jnp.ndarray) -> "SparseTensor":
        grid, feats = sparse_ops.prune(self.grid, self.feats, keep)
        return SparseTensor(grid, feats)

    def union(self, other: "SparseTensor") -> "SparseTensor":
        grid, feats = sparse_ops.union(self.grid, self.feats, other.grid, other.feats)
        return SparseTensor(grid, feats)

    def features_at_coordinates(
        self, points: jnp.ndarray, voxel_size: float
    ) -> jnp.ndarray:
        """Trilinear sampling at continuous coordinates
        (ME ``features_at_coordinates``, MinkowskiSparseTensor.py:643)."""
        return sparse_ops.trilinear_interpolate(
            self.grid, self.feats, points, voxel_size
        )

    def dense(self, shape=None) -> np.ndarray:
        """Materialize to a dense (X, Y, Z, C) numpy volume (host-side
        convenience; ME ``dense()``, MinkowskiSparseTensor.py:442)."""
        c = int(self.grid.count)
        coords = np.asarray(self.grid.coords)[:c, 1:]
        feats = np.asarray(self.feats)[:c]
        mins = coords.min(axis=0)
        rel = (coords - mins) // self.grid.stride
        if shape is None:
            shape = tuple(rel.max(axis=0) + 1)
        out = np.zeros((*shape, feats.shape[1]), feats.dtype)
        out[rel[:, 0], rel[:, 1], rel[:, 2]] = feats
        return out
