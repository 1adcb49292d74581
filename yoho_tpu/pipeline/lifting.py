"""Group-feature lifting: FCGF over all 60 rotations + kNN transfer.

Reference: ``YOHO_testset.py:109-168`` runs 60 independent FCGF forward
passes per cloud through a torch DataLoader (the system's dominant
wall-clock cost, SURVEY.md §3.1). Here the 60 rotations are a *mapped
axis* of one jitted program: ``lax.map(..., batch_size=bg)`` vmaps
``bg`` rotations at a time, so the MXU sees batched matmuls and the
whole lift is one compile. The group axis is embarrassingly parallel
and can be sharded across devices (see ``parallel/``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yoho_tpu.group import get_group
from yoho_tpu.models.plan import build_unet_plan
from yoho_tpu.ops.knn import nn_search
from yoho_tpu.ops.voxel import build_grid


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
) -> jnp.ndarray:
    """Lift one cloud to (num_keypoints, 60, 32) FCGF group features.

    Args:
      fcgf_apply: bound apply fn ``(variables, feats, plan) -> (N, 32)``.
      points: (N_pad, 3) float32, rows >= num_points ignored.
      keypoints: (Kn, 3) float32 (reference: 5,000 per cloud).

    Per rotation g (reference ``YOHO_testset.py:35-50,139-159``):
    rotate cloud by R_g, voxelize, FCGF, then 1-NN transfer from the
    selected voxel representative points to the rotated keypoints.
    """
    Rgroup = jnp.asarray(get_group().rotations, jnp.float32)
    kn = keypoints.shape[0]
    pad_kn = (-kn) % knn_chunk

    def one_rotation(R):
        pts = points @ R.T
        grid, first = build_grid(pts, voxel_size, num_points)
        plan = build_unet_plan(grid, conv1_kernel_size)
        feats_in = jnp.ones((points.shape[0], 1), points.dtype)
        f = fcgf_apply(fcgf_variables, feats_in, plan)  # (N_pad, 32)
        # representative point of each voxel = first-occurrence original
        # point (reference keeps the selected point, not the voxel
        # center: ``dsxyz_batch0``, YOHO_testset.py:87,151)
        vox_pts = pts[first]
        keys_r = keypoints @ R.T
        if pad_kn:
            keys_r = jnp.concatenate(
                [keys_r, jnp.zeros((pad_kn, 3), keys_r.dtype)], axis=0
            )
        idx = nn_search(keys_r, vox_pts, plan.mask1, chunk=knn_chunk)[:kn]
        return f[idx]  # (Kn, 32)

    out = jax.lax.map(one_rotation, Rgroup, batch_size=rotations_per_batch)
    return out.transpose(1, 0, 2)  # (Kn, 60, 32)


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
