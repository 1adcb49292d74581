"""Sparse-engine op family: pooling, broadcast, pruning, interpolation,
union, SpMM.

TPU-native equivalents of MinkowskiEngine's remaining native kernels
(reference ``src/local_pooling_gpu.cu``, ``global_pooling_gpu.cu``,
``broadcast_kernel.cu``, ``pruning_gpu.cu``, ``interpolation_gpu.cu``,
``spmm.cu``, ``direct_max_pool.cpp`` and their Python modules
``MinkowskiPooling.py``/``MinkowskiBroadcast.py``/``MinkowskiPruning.py``
/``MinkowskiUnion.py``/``MinkowskiInterpolation.py``). Everything is a
masked gather / segment reduction over the same sorted-grid kernel maps
used by convolution — no scatter atomics, deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yoho_tpu.ops.kernel_map import KernelMap, merge_join_search, search_keys
from yoho_tpu.ops.voxel import SENTINEL, SparseGrid, pack_keys, unique_voxels


# ---------------------------------------------------------------- pooling


def local_pool(feats: jnp.ndarray, kmap: KernelMap, mode: str = "max") -> jnp.ndarray:
    """Kernel-footprint pooling (ME MinkowskiSumPooling/AvgPooling/
    MaxPooling; modes per ``pybind/extern.hpp:709-733``).

    feats (N, C), kmap (K, M) -> (M, C).
    """
    K, M = kmap.in_idx.shape
    C = feats.shape[1]
    g = jnp.take(feats, kmap.in_idx.reshape(-1), axis=0).reshape(K, M, C)
    v = kmap.valid[:, :, None]
    if mode == "max":
        g = jnp.where(v, g, -jnp.inf)
        out = jnp.max(g, axis=0)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    s = jnp.sum(jnp.where(v, g, 0.0), axis=0)
    if mode == "sum":
        return s
    if mode == "avg":
        n = jnp.maximum(jnp.sum(kmap.valid, axis=0), 1)[:, None]
        return s / n
    raise ValueError(f"unknown pool mode {mode!r}")


def local_pool_argmax(feats: jnp.ndarray, kmap: KernelMap) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Max pool returning per-channel argmax input rows (for exact
    custom backward or ME's ``direct_max_pool`` parity)."""
    K, M = kmap.in_idx.shape
    C = feats.shape[1]
    g = jnp.take(feats, kmap.in_idx.reshape(-1), axis=0).reshape(K, M, C)
    g = jnp.where(kmap.valid[:, :, None], g, -jnp.inf)
    k_best = jnp.argmax(g, axis=0)  # (M, C)
    out = jnp.take_along_axis(g, k_best[None], axis=0)[0]
    rows = kmap.in_idx[k_best, jnp.arange(M)[:, None]]  # (M, C)
    return jnp.where(jnp.isfinite(out), out, 0.0), rows


def global_pool(
    feats: jnp.ndarray,
    batch_idx: jnp.ndarray,
    mask: jnp.ndarray,
    num_batches: int,
    mode: str = "avg",
) -> jnp.ndarray:
    """Per-batch-row reduction (ME MinkowskiGlobal*Pooling via the
    origin map; reference ``global_pooling_gpu.cu``)."""
    b = jnp.where(mask, batch_idx, num_batches)
    if mode == "max":
        init = jnp.full((num_batches + 1, feats.shape[1]), -jnp.inf, feats.dtype)
        out = init.at[b].max(feats)[:num_batches]
        return jnp.where(jnp.isfinite(out), out, 0.0)
    s = jnp.zeros((num_batches + 1, feats.shape[1]), feats.dtype).at[b].add(
        jnp.where(mask[:, None], feats, 0.0)
    )[:num_batches]
    if mode == "sum":
        return s
    counts = jnp.zeros((num_batches + 1,), feats.dtype).at[b].add(
        mask.astype(feats.dtype)
    )[:num_batches]
    return s / jnp.maximum(counts, 1.0)[:, None]


def broadcast(
    feats: jnp.ndarray,
    batch_idx: jnp.ndarray,
    batch_vec: jnp.ndarray,
    op: str = "add",
) -> jnp.ndarray:
    """Combine a per-batch vector back onto all rows (ME
    MinkowskiBroadcastAddition/Multiplication,
    ``broadcast_kernel.cu``)."""
    v = batch_vec[batch_idx]
    if op == "add":
        return feats + v
    if op == "mul":
        return feats * v
    raise ValueError(f"unknown broadcast op {op!r}")


# ---------------------------------------------------------------- pruning


def prune(
    grid: SparseGrid, feats: jnp.ndarray, keep: jnp.ndarray
) -> tuple[SparseGrid, jnp.ndarray]:
    """Keep rows where ``keep`` — compacted, still sorted (ME
    MinkowskiPruning; reference ``coordinate_map_cpu.hpp:520-538``)."""
    n = grid.coords.shape[0]
    valid = (jnp.arange(n) < grid.count) & keep
    rank = jnp.cumsum(valid) - 1
    dest = jnp.where(valid, rank, n)
    count = jnp.sum(valid).astype(jnp.int32)
    new_coords = jnp.zeros_like(grid.coords).at[dest].set(grid.coords, mode="drop")
    new_hi = jnp.full((n,), SENTINEL).at[dest].set(grid.key_hi, mode="drop")
    new_lo = jnp.full((n,), SENTINEL).at[dest].set(grid.key_lo, mode="drop")
    new_feats = jnp.zeros_like(feats).at[dest].set(feats, mode="drop")
    return (
        SparseGrid(new_coords, new_hi, new_lo, count, grid.stride),
        new_feats,
    )


# ---------------------------------------------------------------- union


def union(
    grid_a: SparseGrid, feats_a: jnp.ndarray, grid_b: SparseGrid, feats_b: jnp.ndarray
) -> tuple[SparseGrid, jnp.ndarray]:
    """Coordinate-union with feature addition (ME MinkowskiUnion)."""
    if isinstance(grid_a.stride, int) and isinstance(grid_b.stride, int):
        assert grid_a.stride == grid_b.stride
    na = grid_a.coords.shape[0]
    nb = grid_b.coords.shape[0]
    coords = jnp.concatenate([grid_a.coords, grid_b.coords])
    valid = jnp.concatenate(
        [jnp.arange(na) < grid_a.count, jnp.arange(nb) < grid_b.count]
    )
    out_grid, _ = unique_voxels(coords, valid, stride=grid_a.stride)
    out_grid = SparseGrid(
        out_grid.coords[: na + nb],
        out_grid.key_hi[: na + nb],
        out_grid.key_lo[: na + nb],
        out_grid.count,
        grid_a.stride,
    )
    C = feats_a.shape[1]
    out = jnp.zeros((na + nb, C), feats_a.dtype)
    for g, f in ((grid_a, feats_a), (grid_b, feats_b)):
        idx, found = search_keys(out_grid, g.key_hi, g.key_lo)
        contrib = jnp.where(found[:, None], f, 0.0)
        out = out.at[jnp.where(found, idx, na + nb)].add(contrib, mode="drop")
    return out_grid, out


# ----------------------------------------------------------- interpolation


def trilinear_interpolate(
    grid: SparseGrid,
    feats: jnp.ndarray,
    points: jnp.ndarray,
    voxel_size: float,
    batch_index: int = 0,
) -> jnp.ndarray:
    """Sample sparse features at continuous points, trilinear over the 8
    surrounding voxel corners; absent corners contribute 0 and weights
    renormalize over present ones (ME MinkowskiInterpolation semantics,
    ``interpolation_gpu.cu``)."""
    q = points / voxel_size - 0.5
    base = jnp.floor(q).astype(jnp.int32)
    frac = q - base
    out = jnp.zeros((points.shape[0], feats.shape[1]), feats.dtype)
    wsum = jnp.zeros((points.shape[0], 1), feats.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner = base + jnp.asarray([dx, dy, dz], jnp.int32)
                w = (
                    (frac[:, 0] * dx + (1 - frac[:, 0]) * (1 - dx))
                    * (frac[:, 1] * dy + (1 - frac[:, 1]) * (1 - dy))
                    * (frac[:, 2] * dz + (1 - frac[:, 2]) * (1 - dz))
                )[:, None]
                coords = jnp.concatenate(
                    [jnp.full((len(points), 1), batch_index, jnp.int32), corner * grid.stride],
                    axis=1,
                )
                q_hi, q_lo = pack_keys(coords)
                idx, found = search_keys(grid, q_hi, q_lo)
                fv = jnp.where(found[:, None], feats[idx], 0.0)
                out = out + w * fv
                wsum = wsum + jnp.where(found[:, None], w, 0.0)
    return out / jnp.maximum(wsum, 1e-12)


# ------------------------------------------------------------------ spmm


def coo_spmm(
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    values: jnp.ndarray,
    mask: jnp.ndarray,
    dense: jnp.ndarray,
    num_rows: int,
    average: bool = False,
) -> jnp.ndarray:
    """COO sparse @ dense (ME ``coo_spmm``/``coo_spmm_average`` via
    cuSPARSE, ``spmm.cu``; here one gather + segment add)."""
    contrib = values[:, None] * dense[cols]
    r = jnp.where(mask, rows, num_rows)
    out = jnp.zeros((num_rows + 1, dense.shape[1]), dense.dtype).at[r].add(
        jnp.where(mask[:, None], contrib, 0.0)
    )[:num_rows]
    if average:
        cnt = jnp.zeros((num_rows + 1,), dense.dtype).at[r].add(
            mask.astype(dense.dtype)
        )[:num_rows]
        out = out / jnp.maximum(cnt, 1.0)[:, None]
    return out
