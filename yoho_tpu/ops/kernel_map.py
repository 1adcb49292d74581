"""Kernel-map construction by vectorized binary search.

TPU replacement for MinkowskiEngine's kernel-map machinery (reference
``src/coordinate_map_cpu.hpp:572-712``, ``coordinate_map_gpu.cu:936-980``,
memoized by ``coordinate_map_manager.cpp:634-690``): instead of probing a
hash table per kernel offset, we binary-search ``out_coord * stride +
offset`` keys in the *sorted* input key array.

The resulting map is **output-indexed and gather-only**: for output row
m and kernel offset k there is at most one input voxel, so sparse
convolution becomes ``out[m] = sum_k feats[in_idx[k, m]] @ W[k]`` with a
validity mask — no scatter, no atomics, fully deterministic (the CUDA
reference needs atomicAdd scatter, ``convolution_kernel.cu:178``).
"""

from __future__ import annotations

import itertools
from functools import lru_cache
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from yoho_tpu.ops.voxel import SENTINEL, SparseGrid, pack_keys


@lru_cache(maxsize=None)
def hypercube_offsets(kernel_size: int, ndim: int = 3) -> np.ndarray:
    """Integer offsets of a HYPER_CUBE kernel region, ME ordering
    convention (reference ``src/kernel_region.hpp:46-259``): offsets
    range over [-(k-1)/2, (k-1)/2] for odd k, fastest axis last.
    """
    assert kernel_size % 2 == 1, "even kernel sizes not needed by YOHO models"
    r = kernel_size // 2
    rng = range(-r, r + 1)
    offs = np.array(list(itertools.product(rng, repeat=ndim)), dtype=np.int32)
    return offs  # (k^ndim, ndim)


def search_keys(
    grid: SparseGrid, q_hi: jnp.ndarray, q_lo: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lexicographic binary search of query key pairs in a sorted grid.

    Returns (index, found): index int32 (Q,) row in grid (clamped to
    valid range; meaningless where ~found), found bool (Q,).
    """
    n = grid.key_hi.shape[0]
    lo_bound = jnp.zeros_like(q_hi)
    hi_bound = jnp.full_like(q_hi, n)
    # fixed trip count; search interval spans n+1 boundary positions
    steps = max(1, int(np.ceil(np.log2(n + 1))) + 1)
    for _ in range(steps):
        mid = (lo_bound + hi_bound) // 2
        mid_hi = grid.key_hi[mid]
        mid_lo = grid.key_lo[mid]
        less = (mid_hi < q_hi) | ((mid_hi == q_hi) & (mid_lo < q_lo))
        lo_bound = jnp.where(less, mid + 1, lo_bound)
        hi_bound = jnp.where(less, hi_bound, mid)
    idx = jnp.clip(lo_bound, 0, n - 1).astype(jnp.int32)
    found = (grid.key_hi[idx] == q_hi) & (grid.key_lo[idx] == q_lo) & (q_hi != SENTINEL)
    return idx, found


class KernelMap(NamedTuple):
    """Gather map for one conv: in_idx[k, m] = input row feeding output
    row m through kernel offset k; valid[k, m] = that neighbor exists
    AND m < out_count."""

    in_idx: jnp.ndarray  # int32 (K, M)
    valid: jnp.ndarray  # bool (K, M)


def build_kernel_map(
    in_grid: SparseGrid,
    out_grid: SparseGrid,
    kernel_size: int,
    transposed: bool = False,
) -> KernelMap:
    """Build the conv gather map between two coordinate sets.

    Forward conv (stride s): out coords live at tensor stride
    ``out_grid.stride``; input voxel for (m, k) is
    ``out_coords[m] + offset[k] * in_grid.stride``.

    Transposed conv (upsampling, reference
    ``coordinate_map_manager.cpp:605-611`` swaps in/out maps): out
    coords are the cached finer grid; the contributing coarse voxel for
    (m, k) is ``out_coords[m] - offset[k] * out_grid.stride`` (sign flip
    = consistent relabeling k -> -k, which is weight-order convention
    only — we train from scratch).
    """
    offsets = hypercube_offsets(kernel_size)  # (K, 3)
    step = out_grid.stride if transposed else in_grid.stride
    if transposed:
        offsets = -offsets
    K = offsets.shape[0]
    m = out_grid.coords.shape[0]
    mask_out = jnp.arange(m) < out_grid.count

    b = out_grid.coords[:, 0]  # (M,)
    xyz = out_grid.coords[:, 1:]  # (M, 3)
    # All K x M queries in one flat binary search (one log2(N) loop
    # instead of K of them — keeps the HLO small even for K=343 conv1).
    q_xyz = xyz[None, :, :] + jnp.asarray(offsets[:, None, :] * step, dtype=jnp.int32)
    q_b = jnp.broadcast_to(b[None, :, None], (K, m, 1))
    q = jnp.concatenate([q_b, q_xyz], axis=-1).reshape(K * m, 4)
    q_hi, q_lo = pack_keys(q)
    flat_mask = jnp.broadcast_to(mask_out[None, :], (K, m)).reshape(K * m)
    q_hi = jnp.where(flat_mask, q_hi, SENTINEL)
    q_lo = jnp.where(flat_mask, q_lo, SENTINEL)
    idx, found = search_keys(in_grid, q_hi, q_lo)
    return KernelMap(
        in_idx=idx.reshape(K, m),
        valid=found.reshape(K, m),
    )
