"""Host-side batch construction for FCGF backbone training.

Mines positive voxel correspondences between overlapping fragments
(3dmatch_train fragments are stored aligned per scene) and applies
independent random-rotation augmentation to each cloud — the FCGF
3DMatch recipe the reference relies on but does not contain.
"""

from __future__ import annotations

import numpy as np

from yoho_tpu.utils.so3 import random_rotation_matrix


def mine_positive_pairs(
    pc0: np.ndarray, pc1: np.ndarray, dist: float, max_pairs: int, rng
) -> np.ndarray:
    """Indices (i, j) with |pc0[i] - pc1[j]| < dist (clouds aligned).
    Subsamples pc0 for tractability; native C++ grid-hash NN."""
    from yoho_tpu import native

    sel = rng.choice(len(pc0), min(len(pc0), 4 * max_pairs), replace=False)
    pairs = native.mine_nn_pairs(pc0, sel.astype(np.int64), pc1, dist, 8 * max_pairs)
    if len(pairs) > max_pairs:
        pairs = pairs[rng.choice(len(pairs), max_pairs, replace=False)]
    return pairs.astype(np.int32)


def make_fcgf_batch(
    pc0: np.ndarray,
    pc1: np.ndarray,
    voxel_size: float,
    pad: int,
    n_pos: int = 512,
    rng=None,
    augment: bool = True,
) -> dict:
    """Build one static-shape training batch from an aligned pair."""
    rng = rng or np.random.default_rng(0)
    pairs = mine_positive_pairs(pc0, pc1, voxel_size, n_pos, rng)
    R0 = random_rotation_matrix(rng) if augment else np.eye(3)
    R1 = random_rotation_matrix(rng) if augment else np.eye(3)
    p0 = (pc0 @ R0.T).astype(np.float32)
    p1 = (pc1 @ R1.T).astype(np.float32)

    def pad_pts(p):
        out = np.zeros((pad, 3), np.float32)
        n = min(len(p), pad)
        out[:n] = p[:n]
        return out, n

    pts0, n0 = pad_pts(p0)
    pts1, n1 = pad_pts(p1)
    pos = np.zeros((n_pos, 2), np.int32)
    m = min(len(pairs), n_pos)
    pos[:m] = pairs[:m]
    mask = np.arange(n_pos) < m
    # correspondences referencing truncated points are invalid
    mask &= (pos[:, 0] < n0) & (pos[:, 1] < n1)
    return {
        "points0": pts0,
        "points1": pts1,
        "n0": np.int32(n0),
        "n1": np.int32(n1),
        "pos_pairs": pos,
        "pos_mask": mask,
    }
