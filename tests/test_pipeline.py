"""Pipeline tests: matching, RANSAC estimators, lifting equivariance."""

import jax
import jax.numpy as jnp
import numpy as np

from yoho_tpu.group import get_group
from yoho_tpu.pipeline.matching import group_mean_inv, mutual_match
from yoho_tpu.pipeline.ransac import (
    kabsch_3pt,
    vote_distribution,
    yoho_c_ransac,
    yoho_o_ransac,
)
from yoho_tpu.utils import so3


def test_mutual_match_recovers_permutation(rng):
    kn = 128
    inv0 = rng.normal(size=(kn, 32)).astype(np.float32)
    perm = rng.permutation(kn)
    inv1 = inv0[perm] + 0.01 * rng.normal(size=(kn, 32)).astype(np.float32)
    res = jax.jit(mutual_match)(jnp.asarray(inv0), jnp.asarray(inv1))
    count = int(res.count)
    assert count >= kn - 2  # near-perfect reciprocity
    pairs = np.asarray(res.pairs)[:count]
    # pair (i, j) should satisfy perm[j] == i
    assert (perm[pairs[:, 1]] == pairs[:, 0]).mean() > 0.95


def test_group_mean_inv_matches_reference_order(rng):
    eqv = rng.normal(size=(10, 60, 32)).astype(np.float32)
    out = np.asarray(group_mean_inv(jnp.asarray(eqv)))
    np.testing.assert_allclose(out, eqv.mean(axis=1), atol=1e-6)


def test_kabsch_exact_recovery(rng):
    R = so3.random_rotation_matrix(rng)
    t = rng.normal(size=3)
    k1 = rng.normal(size=(3, 3))
    k0 = k1 @ R.T + t
    T = np.asarray(kabsch_3pt(jnp.asarray(k0, dtype=jnp.float32), jnp.asarray(k1, dtype=jnp.float32)))
    np.testing.assert_allclose(T[:, :3], R, atol=1e-5)
    np.testing.assert_allclose(T[:, 3], t, atol=1e-5)


def test_vote_distribution_reference_semantics():
    dr = jnp.asarray([0] * 30 + [5] * 20 + [9], jnp.int32)
    mask = jnp.asarray([True] * 51)
    p, votes, degen = vote_distribution(dr, mask)
    votes = np.asarray(votes)
    assert votes[0] == 30 and votes[5] == 20 and votes[9] == 1
    p = np.asarray(p)
    assert p[9] == 0.0  # < 2 votes
    # p ∝ n(n-.01)(n-.02), n = votes/100
    n0, n5 = 0.30, 0.20
    r = (n0 * (n0 - 0.01) * (n0 - 0.02)) / (n5 * (n5 - 0.01) * (n5 - 0.02))
    np.testing.assert_allclose(p[0] / p[5], r, rtol=1e-5)
    assert not bool(degen)


def test_vote_distribution_tiny_counts_degenerate_like_reference():
    """Reference quirk preserved: n = votes/100 makes 2-vote bins score
    exactly zero (n-0.02 == 0), and e.g. {3,2} votes sum to 6e-6 < 1e-4
    -> degenerate (estimator.py:45-49)."""
    dr = jnp.asarray([0, 0, 0, 5, 5, 9], jnp.int32)
    mask = jnp.asarray([True] * 6)
    p, votes, degen = vote_distribution(dr, mask)
    assert bool(degen)


def test_vote_distribution_degenerate():
    dr = jnp.zeros(10, jnp.int32)
    mask = jnp.zeros(10, bool)
    p, votes, degen = vote_distribution(dr, mask)
    assert bool(degen)


def _synthetic_pair(rng, kn=256, m=200, outlier_frac=0.3):
    G = get_group()
    keys1 = rng.uniform(-1, 1, size=(kn, 3)).astype(np.float32)
    gi = 17
    R_delta = so3.axis_angle_matrix(rng.normal(size=3), np.deg2rad(10.0))
    R = (R_delta @ G.rotations[gi]).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    keys0 = (keys1 @ R.T + t).astype(np.float32)
    pairs = np.zeros((kn, 2), np.int32)
    mask = np.zeros(kn, bool)
    sel = rng.choice(kn, m, replace=False)
    pairs[:m, 0] = sel
    pairs[:m, 1] = sel
    n_out = int(m * outlier_frac)
    pairs[:n_out, 1] = rng.choice(kn, n_out)  # corrupt matches
    mask[:m] = True
    dr = np.full(kn, 0, np.int32)
    dr[:m] = gi
    dr[:n_out] = rng.integers(0, 60, n_out)  # outliers vote randomly
    return keys0, keys1, pairs, mask, dr, R, t, gi


def test_yoho_c_ransac_recovers_pose(rng):
    keys0, keys1, pairs, mask, dr, R, t, gi = _synthetic_pair(rng)
    res = jax.jit(
        lambda k: yoho_c_ransac(
            k,
            jnp.asarray(keys0),
            jnp.asarray(keys1),
            jnp.asarray(pairs),
            jnp.asarray(mask),
            jnp.asarray(dr),
            max_iter=200,
            inlier_dist=0.07,
        )
    )(jax.random.PRNGKey(0))
    T = np.asarray(res.transform)
    assert not bool(res.degenerate)
    assert so3.compute_R_diff(R, T[:, :3]) < 2.0
    assert np.linalg.norm(T[:, 3] - t) < 0.05
    assert float(res.overlap) > 0.6


def test_yoho_c_degenerate_returns_identity(rng):
    kn = 64
    keys = rng.normal(size=(kn, 3)).astype(np.float32)
    pairs = np.zeros((kn, 2), np.int32)
    mask = np.zeros(kn, bool)  # no matches at all
    dr = np.zeros(kn, np.int32)
    res = yoho_c_ransac(
        jax.random.PRNGKey(0),
        jnp.asarray(keys),
        jnp.asarray(keys),
        jnp.asarray(pairs),
        jnp.asarray(mask),
        jnp.asarray(dr),
        max_iter=50,
        inlier_dist=0.07,
    )
    assert bool(res.degenerate)
    np.testing.assert_allclose(np.asarray(res.transform)[:, :3], np.eye(3), atol=0)


def test_yoho_o_ransac_picks_true_transform(rng):
    keys0, keys1, pairs, mask, dr, R, t, gi = _synthetic_pair(rng, outlier_frac=0.0)
    m = int(mask.sum())
    kn = pairs.shape[0]
    transforms = rng.normal(size=(kn, 3, 4)).astype(np.float32)
    true_T = np.concatenate([R, t[:, None]], axis=1).astype(np.float32)
    transforms[37] = true_T
    res = jax.jit(
        lambda: yoho_o_ransac(
            jnp.asarray(keys0),
            jnp.asarray(keys1),
            jnp.asarray(pairs),
            jnp.asarray(mask),
            jnp.asarray(transforms),
            inlier_dist=0.09,
        )
    )()
    assert int(res.best_iter) == 37
    np.testing.assert_allclose(np.asarray(res.transform), true_T, atol=1e-6)


def test_refine_transform_recovers_exact_pose(rng):
    """All-inlier re-fit: a perturbed 3-point estimate over noisy-ish
    inliers converges to the exact transform (and ignores outliers)."""
    import jax.numpy as jnp

    from yoho_tpu.pipeline.ransac import refine_transform
    from yoho_tpu.utils.so3 import random_rotation_matrix

    R = random_rotation_matrix(rng).astype(np.float32)
    t = rng.uniform(-1, 1, 3).astype(np.float32)
    k1 = rng.uniform(-2, 2, (400, 3)).astype(np.float32)
    k0 = (k1 @ R.T + t).astype(np.float32)
    # 30% outliers
    out = rng.random(400) < 0.3
    k0[out] += rng.uniform(1, 3, (int(out.sum()), 3)).astype(np.float32)
    mask = np.ones(400, bool)
    # perturbed initial estimate (small rotation + translation offset)
    ax = rng.normal(size=3)
    ax /= np.linalg.norm(ax)
    th = np.radians(4)
    Kx = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    dR = (np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx).astype(
        np.float32
    )
    T0 = np.concatenate([dR @ R, (t + 0.03)[:, None]], 1).astype(np.float32)
    T = np.asarray(
        refine_transform(
            jnp.asarray(T0), jnp.asarray(k0), jnp.asarray(k1),
            jnp.asarray(mask), 0.07, iters=2,
        )
    )
    ang = np.degrees(np.arccos(np.clip((np.trace(T[:, :3] @ R.T) - 1) / 2, -1, 1)))
    assert ang < 0.1, ang
    assert np.linalg.norm(T[:, 3] - t) < 0.01
    assert np.linalg.det(T[:, :3]) > 0.9
    # fewer than 3 inliers: transform must pass through unchanged
    far = np.concatenate([np.eye(3, dtype=np.float32), np.full((3, 1), 50, np.float32)], 1)
    T2 = np.asarray(
        refine_transform(
            jnp.asarray(far), jnp.asarray(k0), jnp.asarray(k1),
            jnp.asarray(mask), 0.07, iters=1,
        )
    )
    np.testing.assert_array_equal(T2, far)
