"""Coordinate plans: the TPU analog of MinkowskiEngine's CoordinateManager.

The reference builds coordinate maps lazily inside each conv layer and
memoizes them in a C++ manager (``coordinate_map_manager.cpp:634-690``).
Here the whole stride pyramid and every kernel map a network needs are
built *once per cloud* as a statically-shaped pytree ("plan"), jitted,
and then threaded through the pure network apply function. This
separates the irregular (sort/search) phase from the dense (MXU) phase —
the key structural difference from the hash-and-scatter GPU design.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from yoho_tpu.ops.kernel_map import (
    KernelMap,
    build_kernel_map,
    build_kernel_maps_shared_input,
    subkernel_slice,
    transpose_kernel_map,
)
from yoho_tpu.ops.voxel import SparseGrid, stride_grid


class UNetPlan(NamedTuple):
    """Everything the 4-level FCGF ResUNet needs for one (batched) cloud.

    Grids at tensor strides 1, 2, 4, 8; per-level validity masks; kernel
    maps for every conv (reused across the two convs of each residual
    block — same memoization ME performs).
    """

    g1: SparseGrid
    g2: SparseGrid
    g4: SparseGrid
    g8: SparseGrid
    mask1: jnp.ndarray
    mask2: jnp.ndarray
    mask4: jnp.ndarray
    mask8: jnp.ndarray
    conv1: KernelMap  # g1 -> g1, kernel conv1_kernel_size
    b1: KernelMap  # g1 -> g1, kernel 3
    down2: KernelMap  # g1 -> g2
    b2: KernelMap  # g2 -> g2
    down3: KernelMap  # g2 -> g4
    b4_g4: KernelMap  # g4 -> g4
    down4: KernelMap  # g4 -> g8
    b4_g8: KernelMap  # g8 -> g8
    up4: KernelMap  # g8 -> g4 (transposed)
    up3: KernelMap  # g4 -> g2 (transposed)
    up2: KernelMap  # g2 -> g1 (transposed)


def _mask(grid: SparseGrid) -> jnp.ndarray:
    return jnp.arange(grid.coords.shape[0]) < grid.count


class LevelsPlan(NamedTuple):
    """Generic stride-pyramid plan for the SimpleNet family
    (reference ``fcgf_model/simpleunet.py``: conv1 -> L-1 stride-2 convs
    -> L-1 transposed convs with skip cats -> k3 conv -> 1x1 final).

    Tuple-typed fields keep this a plain pytree for any level count.
    """

    grids: tuple  # (L,) SparseGrid at strides 1, 2, ..., 2^(L-1)
    masks: tuple  # (L,) bool (N_l,)
    conv1: KernelMap  # g1 -> g1 at conv1_kernel_size
    b1: KernelMap  # g1 -> g1 at kernel 3 (decoder's conv1_tr)
    downs: tuple  # (L-1,) g_l -> g_{l+1} kernel-3 maps
    ups: tuple  # (L-1,) transposed maps g_{l+1} -> g_l


def build_levels_plan(
    g1: SparseGrid, num_levels: int, conv1_kernel_size: int = 3
) -> LevelsPlan:
    """Build a SimpleNet-family plan with ``num_levels`` grids. Jittable."""
    n1 = g1.coords.shape[0]
    grids = [g1]
    for lv in range(1, num_levels):
        g, _ = stride_grid(grids[-1], 2, out_size=max(n1 >> lv, 1024))
        grids.append(g)
    downs = []
    conv1 = None
    for lv in range(num_levels - 1):
        if lv == 0:
            conv1, d = build_kernel_maps_shared_input(
                grids[0], [(grids[0], conv1_kernel_size), (grids[1], 3)]
            )
        else:
            d = build_kernel_map(grids[lv], grids[lv + 1], 3)
        downs.append(d)
    b1 = conv1 if conv1_kernel_size == 3 else subkernel_slice(conv1, conv1_kernel_size, 3)
    ups = tuple(
        transpose_kernel_map(downs[lv], grids[lv].coords.shape[0])
        for lv in range(num_levels - 1)
    )
    return LevelsPlan(
        grids=tuple(grids),
        masks=tuple(_mask(g) for g in grids),
        conv1=conv1,
        b1=b1,
        downs=tuple(downs),
        ups=ups,
    )


def build_unet_plan(g1: SparseGrid, conv1_kernel_size: int = 3) -> UNetPlan:
    """Build the full plan from the stride-1 grid. Jittable.

    Search-budget engineering (the hot cost of the whole lift, cf.
    SURVEY.md §7 "hard parts" #2):
    * the 3^3 block map at level 1 is a row-slice of the conv1 map
      (hypercube offsets nest) — no extra search;
    * per level, the block conv and the downsampling conv share one
      merged sort (``build_kernel_maps_shared_input``);
    * all three decoder (transposed) maps are derived from the encoder
      maps by a scatter inversion (``transpose_kernel_map``) — the ME
      in/out-swap memoization, done tensor-style.
    """
    n1 = g1.coords.shape[0]
    # Shrinking per-level pads: scans are 2-manifolds, so stride-2
    # merges ~4x voxels; /2 per level is conservative. Saturation at
    # the pad drops highest-key voxels (never observed on real scans;
    # behavior is well-defined and tested).
    g2, _ = stride_grid(g1, 2, out_size=max(n1 // 2, 1024))
    g4, _ = stride_grid(g2, 2, out_size=max(n1 // 4, 1024))
    g8, _ = stride_grid(g4, 2, out_size=max(n1 // 8, 1024))
    conv1, down2 = build_kernel_maps_shared_input(
        g1, [(g1, conv1_kernel_size), (g2, 3)]
    )
    b1 = conv1 if conv1_kernel_size == 3 else subkernel_slice(conv1, conv1_kernel_size, 3)
    b2, down3 = build_kernel_maps_shared_input(g2, [(g2, 3), (g4, 3)])
    b4_g4, down4 = build_kernel_maps_shared_input(g4, [(g4, 3), (g8, 3)])
    b4_g8 = build_kernel_map(g8, g8, 3)
    return UNetPlan(
        g1=g1,
        g2=g2,
        g4=g4,
        g8=g8,
        mask1=_mask(g1),
        mask2=_mask(g2),
        mask4=_mask(g4),
        mask8=_mask(g8),
        conv1=conv1,
        b1=b1,
        down2=down2,
        b2=b2,
        down3=down3,
        b4_g4=b4_g4,
        down4=down4,
        b4_g8=b4_g8,
        up4=transpose_kernel_map(down4, g4.coords.shape[0]),
        up3=transpose_kernel_map(down3, g2.coords.shape[0]),
        up2=transpose_kernel_map(down2, n1),
    )
