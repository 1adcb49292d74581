"""Rotation math: quaternion <-> matrix, geodesic distance, sampling.

Numpy + JAX twin implementations. The numpy side mirrors the reference's
rotation utilities (``/root/reference/utils/r_eval.py:9-120``,
``/root/reference/utils/utils.py:52-82``) so evaluation protocols agree
bit-for-bit where it matters; the JAX side is used inside jitted
pipelines (PartII quaternion heads, RANSAC).

Quaternion convention: (w, x, y, z), w >= 0 canonicalized.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def safe_l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize with a NaN-free gradient at x == 0.

    ``norm(x).clip(eps)`` has a 0 * inf = NaN backward at exact zeros
    (sqrt'(0) = inf meets clip's zero cotangent) — and exact-zero rows
    are now guaranteed by the sparse engine's zero-row invariant.
    ``sqrt(sum(x^2) + eps^2)`` keeps the forward value within fp32
    rounding for any non-degenerate row and is smooth at zero.
    """
    sumsq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x / jnp.sqrt(sumsq + eps * eps)

# --------------------------------------------------------------------------
# numpy implementations (protocol-exact, used by eval + dataset tooling)
# --------------------------------------------------------------------------


def quaternion_from_matrix(matrix: np.ndarray) -> np.ndarray:
    """Rotation matrix -> unit quaternion (w,x,y,z), w >= 0.

    Eigenvector method (robust for near-degenerate inputs), matching the
    reference's ``quaternion_from_matrix`` (``utils/r_eval.py:9-92``).
    """
    M = np.asarray(matrix, dtype=np.float64)[:3, :3]
    m00, m01, m02 = M[0]
    m10, m11, m12 = M[1]
    m20, m21, m22 = M[2]
    K = np.array(
        [
            [m00 - m11 - m22, 0.0, 0.0, 0.0],
            [m01 + m10, m11 - m00 - m22, 0.0, 0.0],
            [m02 + m20, m12 + m21, m22 - m00 - m11, 0.0],
            [m21 - m12, m02 - m20, m10 - m01, m00 + m11 + m22],
        ]
    ) / 3.0
    w, V = np.linalg.eigh(K)
    q = V[[3, 0, 1, 2], np.argmax(w)]
    if q[0] < 0.0:
        np.negative(q, q)
    return q


def matrix_from_quaternion(q: np.ndarray) -> np.ndarray:
    """Quaternion (w,x,y,z) -> 3x3 rotation matrix.

    Matches the reference's ``matrix_from_quaternion``
    (``utils/r_eval.py:94-110``): the quaternion is *not* normalized
    first (the PartII test path normalizes before calling).
    """
    w, x, y, z = (float(v) for v in np.asarray(q).reshape(4))
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def compute_R_diff(R_gt: np.ndarray, R: np.ndarray) -> float:
    """Geodesic angle between two rotations, in degrees.

    Same formula as the reference (``utils/r_eval.py:112-120``):
    quaternion inner-product form, robust to sign ambiguity.
    """
    eps = 1e-15
    q_gt = quaternion_from_matrix(R_gt)
    q = quaternion_from_matrix(R)
    q = q / (np.linalg.norm(q) + eps)
    q_gt = q_gt / (np.linalg.norm(q_gt) + eps)
    loss_q = np.maximum(eps, 1.0 - np.sum(q * q_gt) ** 2)
    err_q = np.arccos(1 - 2 * loss_q)
    return float(np.rad2deg(np.abs(err_q)))


def rotation_angle_deg(R: np.ndarray) -> float:
    """Angle of a single rotation matrix, degrees, clamped into [0, 180]."""
    c = (np.trace(np.asarray(R)[:3, :3]) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def random_rotation_matrix(rng: np.random.Generator | None = None) -> np.ndarray:
    """Uniform random rotation (Haar measure) via random quaternion."""
    rng = rng or np.random.default_rng()
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return matrix_from_quaternion(q)


def axis_angle_matrix(axis: np.ndarray, angle_rad: float) -> np.ndarray:
    """Rodrigues' formula."""
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [
            [0.0, -axis[2], axis[1]],
            [axis[2], 0.0, -axis[0]],
            [-axis[1], axis[0], 0.0],
        ]
    )
    return np.eye(3) + math.sin(angle_rad) * K + (1.0 - math.cos(angle_rad)) * (K @ K)


def transform_points(pts: np.ndarray, transform: np.ndarray) -> np.ndarray:
    """Apply a 3x4 or 4x4 transform: R @ p + t (reference ``utils/utils.py:42-50``)."""
    R, t = transform[:3, :3], transform[:3, 3]
    return pts @ R.T + t[None, :]


# --------------------------------------------------------------------------
# JAX implementations (jit-safe, batched)
# --------------------------------------------------------------------------


def jax_matrix_from_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Batched quaternion (..., 4) (w,x,y,z) -> (..., 3, 3). Not pre-normalized."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * y * y - 2 * z * z
    r01 = 2 * x * y - 2 * z * w
    r02 = 2 * x * z + 2 * y * w
    r10 = 2 * x * y + 2 * z * w
    r11 = 1 - 2 * x * x - 2 * z * z
    r12 = 2 * y * z - 2 * x * w
    r20 = 2 * x * z - 2 * y * w
    r21 = 2 * y * z + 2 * x * w
    r22 = 1 - 2 * x * x - 2 * y * y
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def jax_quaternion_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Batched rotation matrix (..., 3, 3) -> quaternion (..., 4), w >= 0.

    Branch-free Shepperd-style construction using all four candidate
    columns weighted by stability (jit/vmap friendly, unlike the
    eigenvector method).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate quaternions (unnormalized), one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    # Diagonal magnitudes decide the most stable candidate.
    mags = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11],
        axis=-1,
    )
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32).repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = safe_l2_normalize(q, axis=-1, eps=1e-6)
    sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q * sign


def jax_rotation_geodesic_deg(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Batched geodesic angle between rotations, degrees."""
    tr = jnp.einsum("...ij,...ij->...", R1, R2)
    c = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(c))


def jax_transform_points(pts: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) x (..., 3|4, 4) -> (..., N, 3)."""
    R = transform[..., :3, :3]
    t = transform[..., :3, 3]
    return jnp.einsum("...nj,...ij->...ni", pts, R) + t[..., None, :]
