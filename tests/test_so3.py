"""Rotation-math tests (numpy/JAX twins agree; round trips hold)."""

import numpy as np

import jax.numpy as jnp

from yoho_tpu.utils import so3


def test_quaternion_matrix_roundtrip(rng):
    for _ in range(50):
        R = so3.random_rotation_matrix(rng)
        q = so3.quaternion_from_matrix(R)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)
        R2 = so3.matrix_from_quaternion(q)
        np.testing.assert_allclose(R, R2, atol=1e-9)


def test_compute_R_diff_known_angles(rng):
    axis = rng.normal(size=3)
    for deg in [0.5, 10, 45, 90, 179]:
        R = so3.axis_angle_matrix(axis, np.deg2rad(deg))
        assert abs(so3.compute_R_diff(np.eye(3), R) - deg) < 1e-5


def test_jax_matrix_from_quaternion_matches_numpy(rng):
    qs = rng.normal(size=(20, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    R_jax = np.asarray(so3.jax_matrix_from_quaternion(jnp.asarray(qs)))
    for i in range(20):
        np.testing.assert_allclose(R_jax[i], so3.matrix_from_quaternion(qs[i]), atol=1e-6)


def test_jax_quaternion_from_matrix_roundtrip(rng):
    Rs = np.stack([so3.random_rotation_matrix(rng) for _ in range(32)])
    q = np.asarray(so3.jax_quaternion_from_matrix(jnp.asarray(Rs)))
    assert np.all(q[:, 0] >= 0)
    R2 = np.asarray(so3.jax_matrix_from_quaternion(jnp.asarray(q)))
    np.testing.assert_allclose(R2, Rs, atol=1e-5)


def test_jax_geodesic(rng):
    axis = rng.normal(size=3)
    R = so3.axis_angle_matrix(axis, np.deg2rad(77.0))
    d = so3.jax_rotation_geodesic_deg(jnp.eye(3), jnp.asarray(R))
    assert abs(float(d) - 77.0) < 1e-4


def test_transform_points_conventions(rng):
    pts = rng.normal(size=(10, 3))
    R = so3.random_rotation_matrix(rng)
    t = rng.normal(size=3)
    T = np.concatenate([R, t[:, None]], axis=1)
    out = so3.transform_points(pts, T)
    np.testing.assert_allclose(out, pts @ R.T + t, atol=1e-12)
    out_j = np.asarray(so3.jax_transform_points(jnp.asarray(pts), jnp.asarray(T)))
    np.testing.assert_allclose(out_j, out, atol=1e-6)
