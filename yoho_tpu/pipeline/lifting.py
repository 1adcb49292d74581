"""Group-feature lifting: FCGF over all 60 rotations + kNN transfer.

Reference: ``YOHO_testset.py:109-168`` runs 60 independent FCGF forward
passes per cloud through a torch DataLoader (the system's dominant
wall-clock cost, SURVEY.md §3.1). TPU-first design: ``bg`` rotated
copies are packed into ONE batched sparse grid (batch coordinate =
rotation id — the same batching trick the reference's collate_fn uses
for clouds, ``YOHO_testset.py:69-107``), so each mini-batch is a single
unbatched network invocation:

* one sort deduplicates all bg rotations at once,
* every conv gather runs on flat indices (the fast ~2.7 ns/row TPU
  gather path — vmapped gathers measured ~4x slower),
* MXU matmuls see bg x more rows.

The 60/bg mini-batches run under ``lax.map``; the group axis remains
embarrassingly parallel for multi-device sharding (see ``parallel/``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yoho_tpu.group import get_group
from yoho_tpu.models.plan import build_unet_plan
from yoho_tpu.ops.knn import nn_search
from yoho_tpu.ops.voxel import unique_voxels


def lift_rotations(
    fcgf_apply,
    fcgf_variables,
    points: jnp.ndarray,
    num_points: jnp.ndarray,
    keypoints: jnp.ndarray,
    rotations: jnp.ndarray,
    voxel_size: float,
    conv1_kernel_size: int = 7,
    rotations_per_batch: int = 4,
    knn_chunk: int = 1024,
    max_voxels: int | None = None,
) -> jnp.ndarray:
    """Lift one cloud over an arbitrary rotation set -> (G', Kn, C).

    The group-axis core shared by the full single-device lift (all 60
    icosahedral rotations) and the device-sharded lift
    (``parallel/sharded.py`` gives each device a 60/n_group slice —
    the rotation axis is embarrassingly parallel, SURVEY.md §2.2).

    Args:
      fcgf_apply: bound apply fn ``(variables, feats, plan) -> (N, 32)``.
      points: (N_pad, 3) float32, rows >= num_points ignored.
      keypoints: (Kn, 3) float32 (reference: 5,000 per cloud).
      rotations: (G', 3, 3); G' must be divisible by rotations_per_batch.

    Per rotation g (reference ``YOHO_testset.py:35-50,139-159``):
    rotate cloud by R_g, voxelize, FCGF, then 1-NN transfer from the
    selected voxel representative points to the rotated keypoints.
    """
    Rgroup = jnp.asarray(rotations, jnp.float32)
    G = Rgroup.shape[0]
    n_pad = points.shape[0]
    kn = keypoints.shape[0]
    pad_kn = (-kn) % knn_chunk
    bg = rotations_per_batch
    assert G % bg == 0, "rotations_per_batch must divide the rotation count"
    # Static voxel budget per rotation: every sort/search/gather in the
    # plan and network scales with it, so callers that pre-voxelize on
    # the host should pick the smallest bucket >= the true voxel count
    # (voxels saturating the budget are dropped, highest keys first).
    nv = max_voxels or n_pad

    def one_batch(Rb):  # (bg, 3, 3) -> (bg, kn, C)
        pts = jnp.einsum("nd,gkd->gnk", points, Rb)  # (bg, n_pad, 3)
        flat_pts = pts.reshape(bg * n_pad, 3)
        xyz = jnp.floor(flat_pts / voxel_size).astype(jnp.int32)
        bidx = jnp.repeat(jnp.arange(bg, dtype=jnp.int32), n_pad)
        coords = jnp.concatenate([bidx[:, None], xyz], axis=1)
        valid = jnp.tile(jnp.arange(n_pad) < num_points, bg)
        grid, first = unique_voxels(coords, valid, out_size=bg * nv)
        plan = build_unet_plan(grid, conv1_kernel_size)
        feats_in = jnp.ones((bg * nv, 1), points.dtype)
        f = fcgf_apply(fcgf_variables, feats_in, plan)  # (bg*nv, C)

        # Rows of rotation g are contiguous in the sorted grid:
        # [starts[g], starts[g] + counts[g]). Compact each rotation's
        # voxel representative points for the per-rotation 1-NN.
        batch_of = jnp.where(plan.mask1, grid.coords[:, 0], bg)
        counts = jnp.sum(
            batch_of[None, :] == jnp.arange(bg)[:, None], axis=1
        ).astype(jnp.int32)
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        j = jnp.arange(nv)
        ok = j[None, :] < counts[:, None]  # (bg, nv)
        row = jnp.where(ok, starts[:, None] + j[None, :], bg * nv - 1)
        # representative point of each voxel = first-occurrence original
        # point (reference keeps the selected point, not the voxel
        # center: ``dsxyz_batch0``, YOHO_testset.py:87,151)
        vox_pts = flat_pts[first]  # (bg*nv, 3)
        vox_b = vox_pts[row.reshape(-1)].reshape(bg, nv, 3)

        keys_r = jnp.einsum("kd,gid->gki", keypoints, Rb)  # (bg, kn, 3)
        if pad_kn:
            keys_r = jnp.concatenate(
                [keys_r, jnp.zeros((bg, pad_kn, 3), keys_r.dtype)], axis=1
            )
        idx = jax.vmap(lambda q, base, m: nn_search(q, base, m, chunk=knn_chunk))(
            keys_r, vox_b, ok
        )[:, :kn]
        flat_idx = starts[:, None] + idx  # rows into f
        return f[flat_idx.reshape(-1)].reshape(bg, kn, -1)

    out = jax.lax.map(one_batch, Rgroup.reshape(G // bg, bg, 3, 3))
    return out.reshape(G, kn, -1)  # (G', Kn, C)


def lift_group_features(
    fcgf_apply,
    fcgf_variables,
    points: jnp.ndarray,
    num_points: jnp.ndarray,
    keypoints: jnp.ndarray,
    voxel_size: float,
    conv1_kernel_size: int = 7,
    rotations_per_batch: int = 4,
    knn_chunk: int = 1024,
    max_voxels: int | None = None,
) -> jnp.ndarray:
    """Lift one cloud to (num_keypoints, 60, 32) FCGF group features
    over the full icosahedral group (reference ``YOHO_testset.py``)."""
    out = lift_rotations(
        fcgf_apply,
        fcgf_variables,
        points,
        num_points,
        keypoints,
        get_group().rotations,
        voxel_size,
        conv1_kernel_size,
        rotations_per_batch,
        knn_chunk,
        max_voxels,
    )
    return out.transpose(1, 0, 2)  # (Kn, 60, C)


def make_lift_fn(model, voxel_size, conv1_kernel_size, rotations_per_batch=4):
    """Returns a jittable ``lift(variables, points, num_points, keys)``."""

    def apply_fn(variables, feats, plan):
        return model.apply(variables, feats, plan, False)

    return partial(
        _lift,
        apply_fn,
        voxel_size=voxel_size,
        conv1_kernel_size=conv1_kernel_size,
        rotations_per_batch=rotations_per_batch,
    )


def _lift(
    apply_fn, variables, points, num_points, keypoints, *, voxel_size,
    conv1_kernel_size, rotations_per_batch
):
    return lift_group_features(
        apply_fn,
        variables,
        points,
        num_points,
        keypoints,
        voxel_size,
        conv1_kernel_size,
        rotations_per_batch,
    )
