"""TensorField: float-coordinate point fields over the sparse engine.

TPU analog of MinkowskiEngine's field machinery — the one ME subsystem
with no counterpart here until round 4 (reference
``MinkowskiTensorField.py`` and ``CoordinateFieldMapCPU``,
``src/coordinate_map_cpu.hpp:947``): a tensor whose coordinates are
continuous (un-quantized) points. The two core operations mirror ME's:

* ``sparse()``  — quantize the field onto a voxel grid, averaging the
  features of every point that lands in a voxel
  (``MinkowskiTensorField.py`` ``TensorField.sparse`` with
  UNWEIGHTED_AVERAGE quantization).
* ``slice(st)`` — map voxel features back onto the field's points
  (``SparseTensor.slice``, ``MinkowskiSparseTensor.py:530``): each point
  reads its voxel's row via one key search.

``features_at_coordinates`` (``MinkowskiSparseTensor.py:643``) is the
trilinear variant and lives in ``ops/sparse_ops.trilinear_interpolate``.

YOHO's pipeline never uses fields (it voxelizes eagerly), so this is
API-surface parity, built from the same sorted-key primitives as the
rest of the engine: one sort for the grid, one binary search per query —
no hash map, deterministic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from yoho_tpu.api import SparseTensor
from yoho_tpu.ops.kernel_map import search_keys
from yoho_tpu.ops.voxel import SparseGrid, pack_keys, unique_voxels


class TensorField(NamedTuple):
    """A batched float-coordinate feature field (static-shape padded).

    coords: (N, 4) float32 — batch index then xyz (continuous).
    feats:  (N, C) features.
    mask:   (N,) bool — valid rows.
    """

    coords: jnp.ndarray
    feats: jnp.ndarray
    mask: jnp.ndarray

    @property
    def F(self) -> jnp.ndarray:  # noqa: N802 — ME naming
        return self.feats

    @property
    def C(self) -> jnp.ndarray:  # noqa: N802
        return self.coords

    def quantized_coords(self, voxel_size: float) -> jnp.ndarray:
        b = self.coords[:, :1].astype(jnp.int32)
        xyz = jnp.floor(self.coords[:, 1:] / voxel_size).astype(jnp.int32)
        return jnp.concatenate([b, xyz], axis=1)

    def sparse(
        self, voxel_size: float, out_size: int | None = None
    ) -> tuple[SparseTensor, jnp.ndarray]:
        """Quantize to a sparse tensor, feature = mean over the voxel's
        field points. Returns (sparse_tensor, inverse) where
        ``inverse[i]`` is the voxel row of field point i (the ME
        inverse_mapping). Invalid points get the OUT-OF-RANGE sentinel
        ``out_size`` — not a live row (advisor round-4 finding: the old
        ``out_size - 1`` aliases a real voxel when the grid fills the
        bucket); the scatters below drop it via ``mode='drop'`` and
        consumers can test ``inverse < out_size``."""
        n = self.coords.shape[0]
        out_size = out_size or n
        coords = self.quantized_coords(voxel_size)
        grid, _first = unique_voxels(coords, self.mask, out_size=out_size)
        q_hi, q_lo = pack_keys(coords)
        idx, found = search_keys(grid, q_hi, q_lo)
        ok = found & self.mask
        inverse = jnp.where(ok, idx, out_size)
        fm = jnp.where(ok[:, None], self.feats, 0.0)
        ssum = jnp.zeros((out_size, self.feats.shape[1]), self.feats.dtype)
        ssum = ssum.at[inverse].add(fm, mode="drop")
        cnt = jnp.zeros((out_size,), self.feats.dtype).at[inverse].add(
            ok.astype(self.feats.dtype), mode="drop"
        )
        vox_feats = ssum / jnp.maximum(cnt, 1.0)[:, None]
        vox_mask = jnp.arange(out_size) < grid.count
        vox_feats = vox_feats * vox_mask[:, None]
        return SparseTensor(grid, vox_feats), inverse

    def slice(self, st: SparseTensor, voxel_size: float) -> "TensorField":
        """Read each field point's voxel features back from ``st``
        (ME ``SparseTensor.slice``): nearest-voxel (not interpolated)
        semantics; points whose voxel is absent get zeros."""
        coords = self.quantized_coords(voxel_size)
        # account for the sparse tensor's stride pyramid position
        s = st.grid.stride
        coords = coords.at[:, 1:].set((coords[:, 1:] // s) * s)
        q_hi, q_lo = pack_keys(coords)
        idx, found = search_keys(st.grid, q_hi, q_lo)
        ok = found & self.mask
        feats = jnp.where(ok[:, None], st.feats[idx], 0.0)
        return TensorField(self.coords, feats, self.mask)


def field_from_points(
    points: jnp.ndarray,
    feats: jnp.ndarray,
    num_valid: jnp.ndarray | int,
    batch_index: int = 0,
) -> TensorField:
    """Build a single-cloud field from (N, 3) points."""
    n = points.shape[0]
    b = jnp.full((n, 1), batch_index, points.dtype)
    coords = jnp.concatenate([b, points], axis=1)
    mask = jnp.arange(n) < num_valid
    return TensorField(coords, feats, mask)
