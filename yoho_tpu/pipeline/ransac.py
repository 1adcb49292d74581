"""On-device RANSAC estimators: YOHO-C and YOHO-O.

Reference: ``/root/reference/tests/estimator.py`` — numpy loops, one
hypothesis at a time, parallelized with a process pool when
``max_iter > 500`` (``yohoc_mul``, ``:269-273``). Here every hypothesis
is a lane of a vmapped computation:

* YOHO-C: sample ``max_iter`` rotation bins from the vote distribution
  p ∝ n(n-0.01)(n-0.02) over bins with >= 2 votes
  (``estimator.py:34-51``), draw 3 same-bin correspondences each,
  closed-form Kabsch (``:55-63``; like the reference, no reflection
  correction of the SVD result), score all hypotheses against all
  matches in one batched matmul, argmax inlier ratio.
* YOHO-O: score *every* per-correspondence transform (the reference
  scores a random <=max_iter subset, ``:321-336``; scoring all is
  both faster here and statistically a superset).

Determinism: given a PRNG key, results are bitwise reproducible —
unlike the reference's global numpy RNG across a process pool.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    transform: jnp.ndarray  # (3, 4): R @ k1 + t = k0
    overlap: jnp.ndarray  # best inlier ratio (scalar)
    best_iter: jnp.ndarray  # iteration index of the best hypothesis
    degenerate: jnp.ndarray  # bool: vote distribution unusable


def kabsch_3pt(
    kps0: jnp.ndarray, kps1: jnp.ndarray, fix_reflection: bool = True
) -> jnp.ndarray:
    """(..., P, 3) x 2 -> (..., 3, 4) rigid transform, reference
    ``Threepps2Tran`` (``estimator.py:55-63``): R = V @ U.T from
    SVD((k1-c1)^T (k0-c0)); t = c0 - c1 @ R.T.

    Deliberate deviation: the reference applies no det(R) correction,
    so some minimal sets yield reflections (det = -1) that waste RANSAC
    draws (scoring rejects them). ``fix_reflection=True`` applies the
    standard Umeyama sign fix — strictly more usable hypotheses per
    iteration; pass False for bug-for-bug reference behavior.
    """
    c0 = jnp.mean(kps0, axis=-2, keepdims=True)
    c1 = jnp.mean(kps1, axis=-2, keepdims=True)
    m = jnp.einsum("...pi,...pj->...ij", kps1 - c1, kps0 - c0)
    u, _, vt = jnp.linalg.svd(m)
    if fix_reflection:
        det = jnp.linalg.det(jnp.einsum("...ji,...kj->...ik", vt, u))
        sign = jnp.stack(
            [jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], axis=-1
        )
        vt = vt * sign[..., :, None]
    rot = jnp.einsum("...ji,...kj->...ik", vt, u)  # V @ U.T
    t = c0[..., 0, :] - jnp.einsum("...j,...ij->...i", c1[..., 0, :], rot)
    return jnp.concatenate([rot, t[..., :, None]], axis=-1)


def overlap_scores(
    transforms: jnp.ndarray,  # (T, 3, 4)
    keys_m0: jnp.ndarray,  # (M, 3)
    keys_m1: jnp.ndarray,  # (M, 3)
    match_mask: jnp.ndarray,  # (M,)
    inlier_dist: float,
) -> jnp.ndarray:
    """Inlier ratio of each hypothesis over the valid matches
    (reference ``overlap_cal``, ``estimator.py:66-70``)."""
    moved = (
        jnp.einsum("mj,tij->tmi", keys_m1, transforms[:, :, :3])
        + transforms[:, None, :, 3]
    )
    diff = jnp.sum(jnp.square(keys_m0[None] - moved), axis=-1)  # (T, M)
    ok = (diff < inlier_dist * inlier_dist) & match_mask[None, :]
    denom = jnp.maximum(jnp.sum(match_mask), 1)
    return jnp.sum(ok, axis=1) / denom


def vote_distribution(
    dr_idx: jnp.ndarray, match_mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """60-bin vote histogram -> (probability, votes, degenerate).

    Reference ``DR_statictic`` (``estimator.py:34-51``): bins with < 2
    votes get probability 0; p ∝ n(n-0.01)(n-0.02) with n = votes/100;
    degenerate when the unnormalized sum < 1e-4.
    """
    idx = jnp.where(match_mask, dr_idx, 60)
    votes = jnp.zeros(61, jnp.int32).at[idx].add(1)[:60]
    n = votes.astype(jnp.float32) / 100.0
    p = n * (n - 0.01) * (n - 0.02)
    p = jnp.where(votes >= 2, p, 0.0)
    total = jnp.sum(p)
    degenerate = total < 1e-4
    p = jnp.where(degenerate, jnp.full_like(p, 1.0 / 60.0), p / jnp.maximum(total, 1e-12))
    return p, votes, degenerate


def yoho_c_ransac(
    key: jax.Array,
    keys0: jnp.ndarray,  # (Kn, 3) keypoints of cloud 0
    keys1: jnp.ndarray,  # (Kn, 3)
    pairs: jnp.ndarray,  # (M, 2) int32 match indices (padded)
    match_mask: jnp.ndarray,  # (M,) bool
    dr_idx: jnp.ndarray,  # (M,) int32 coarse rotation per match
    max_iter: int,
    inlier_dist: float,
    refine_iters: int = 0,
) -> RansacResult:
    """Rotation-guided 3-point RANSAC (YOHO-C), fully vmapped.

    ``refine_iters`` > 0 re-fits the winning hypothesis on ALL its
    inliers (``refine_transform``) — a deviation from the reference
    (which keeps the raw 3-point Kabsch, ``estimator.py:55-63``) that
    costs one masked SVD and sharply reduces the translation error of
    minimal-set fits. 0 = bit-faithful reference behavior.
    """
    M = pairs.shape[0]
    keys_m0 = keys0[pairs[:, 0]]
    keys_m1 = keys1[pairs[:, 1]]

    prob, votes, degenerate = vote_distribution(dr_idx, match_mask)

    # Per-bin member table: matches sorted by bin; bin b occupies
    # rows [starts[b], starts[b] + votes[b]).
    bins = jnp.where(match_mask, dr_idx, 60)
    order = jnp.argsort(bins, stable=True).astype(jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(votes).astype(jnp.int32)[:-1]]
    )

    kb, ku = jax.random.split(key)
    logits = jnp.log(jnp.maximum(prob, 1e-30))
    bin_draw = jax.random.categorical(kb, logits, shape=(max_iter,))  # (T,)
    u = jax.random.uniform(ku, (max_iter, 3))
    nb = votes[bin_draw].astype(jnp.float32)  # (T,)
    member_pos = (u * nb[:, None]).astype(jnp.int32)  # with replacement
    member_pos = jnp.clip(member_pos, 0, jnp.maximum(votes[bin_draw][:, None] - 1, 0))
    member = order[starts[bin_draw][:, None] + member_pos]  # (T, 3) match rows

    kps0 = keys_m0[member]  # (T, 3, 3)
    kps1 = keys_m1[member]
    transforms = kabsch_3pt(kps0, kps1)  # (T, 3, 4)
    scores = overlap_scores(transforms, keys_m0, keys_m1, match_mask, inlier_dist)
    best = jnp.argmax(scores)
    trans = transforms[best]
    score = scores[best]
    if refine_iters:
        trans = refine_transform(
            trans, keys_m0, keys_m1, match_mask, inlier_dist, refine_iters
        )
        score = overlap_scores(
            trans[None], keys_m0, keys_m1, match_mask, inlier_dist
        )[0]
    identity = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    return RansacResult(
        transform=jnp.where(degenerate, identity, trans),
        overlap=jnp.where(degenerate, 0.0, score),
        best_iter=best.astype(jnp.int32),
        degenerate=degenerate,
    )


def yoho_o_ransac(
    keys0: jnp.ndarray,
    keys1: jnp.ndarray,
    pairs: jnp.ndarray,
    match_mask: jnp.ndarray,
    transforms: jnp.ndarray,  # (M, 3, 4) per-correspondence transforms (PartII)
    inlier_dist: float,
    refine_iters: int = 0,
    refine_topk: int = 8,
) -> RansacResult:
    """One-hypothesis-per-correspondence scoring (YOHO-O).

    ``refine_iters`` > 0 refines the ``refine_topk`` best-scoring
    hypotheses on their inlier sets and keeps the best refined one —
    pre-refinement overlap ranking is noisy at low inlier ratios, and a
    near-miss transform a few degrees off often re-fits to the true
    pose from its accidental inliers (same deviation family as
    ``yoho_c_ransac``'s re-fit; 0 = reference behavior)."""
    keys_m0 = keys0[pairs[:, 0]]
    keys_m1 = keys1[pairs[:, 1]]
    scores = overlap_scores(transforms, keys_m0, keys_m1, match_mask, inlier_dist)
    scores = jnp.where(match_mask, scores, -1.0)  # padded transforms can't win
    best = jnp.argmax(scores)
    if refine_iters:
        _, top = jax.lax.top_k(scores, refine_topk)
        cand = jax.vmap(
            lambda T: refine_transform(
                T, keys_m0, keys_m1, match_mask, inlier_dist, refine_iters
            )
        )(transforms[top])
        cscores = overlap_scores(cand, keys_m0, keys_m1, match_mask, inlier_dist)
        ci = jnp.argmax(cscores)
        return RansacResult(
            transform=cand[ci],
            overlap=cscores[ci],
            best_iter=top[ci].astype(jnp.int32),
            degenerate=jnp.asarray(False),
        )
    return RansacResult(
        transform=transforms[best],
        overlap=scores[best],
        best_iter=best.astype(jnp.int32),
        degenerate=jnp.asarray(False),
    )


def refine_transform(
    transform: jnp.ndarray,
    keys_m0: jnp.ndarray,
    keys_m1: jnp.ndarray,
    match_mask: jnp.ndarray,
    inlier_dist: float,
    iters: int = 1,
) -> jnp.ndarray:
    """Optional inlier re-fit (weighted Kabsch over current inliers).

    The reference has no refinement stage; this is a TPU-cheap accuracy
    upgrade, off by default in protocol-parity evaluations.
    """
    def body(_, T):
        moved = keys_m1 @ T[:, :3].T + T[:, 3]
        w = (jnp.sum(jnp.square(keys_m0 - moved), -1) < inlier_dist**2) & match_mask
        wf = w.astype(keys_m0.dtype)[:, None]
        n = jnp.maximum(wf.sum(), 1.0)
        c0 = (keys_m0 * wf).sum(0) / n
        c1 = (keys_m1 * wf).sum(0) / n
        m = jnp.einsum("pi,pj->ij", (keys_m1 - c1) * wf, keys_m0 - c0)
        u, _, vt = jnp.linalg.svd(m)
        # Umeyama sign fix: reject reflections (same as kabsch_3pt)
        d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
        s = jnp.ones((3,)).at[2].set(d)
        rot = (vt.T * s[None, :]) @ u.T
        t = c0 - rot @ c1
        refined = jnp.concatenate([rot, t[:, None]], axis=1)
        # fewer than 3 inliers: the fit is underdetermined — keep T
        return jnp.where(wf.sum() >= 3.0, refined, T)

    return jax.lax.fori_loop(0, iters, body, transform)
