"""Mutual-nearest-neighbor keypoint matching.

Reference: ``matcher_dual.match`` (``/root/reference/tests/matcher.py:
19-49``): group-mean the equivariant descriptors to 32-d invariant
descriptors, two 1-NN passes, keep reciprocal pairs. The reference
chunks kNN on GPU and filters in a Python loop; here it is one
(Kn, 32) @ (32, Kn) matmul pair + a vectorized reciprocity mask, all
inside jit with a static-size padded output.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MatchResult(NamedTuple):
    pairs: jnp.ndarray  # int32 (Kn, 2) padded with 0
    mask: jnp.ndarray  # bool (Kn,)
    count: jnp.ndarray  # int32 scalar


def nn_and_reciprocity(
    inv0: jnp.ndarray, inv1: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(nn0in1, mutual): each cloud-0 row's 1-NN in cloud 1 and whether
    the match is reciprocal. The O(Kn^2) core of mutual matching."""
    kn = inv0.shape[0]
    sq0 = jnp.sum(inv0 * inv0, axis=1)
    sq1 = jnp.sum(inv1 * inv1, axis=1)
    d = sq0[:, None] - 2.0 * (inv0 @ inv1.T) + sq1[None, :]  # (Kn, Kn)
    nn0in1 = jnp.argmin(d, axis=1).astype(jnp.int32)  # best 1 for each 0
    nn1in0 = jnp.argmin(d, axis=0).astype(jnp.int32)  # best 0 for each 1
    idx = jnp.arange(kn, dtype=jnp.int32)
    mutual = nn1in0[nn0in1] == idx  # reciprocity
    return nn0in1, mutual


def compact_matches(nn0in1: jnp.ndarray, mutual: jnp.ndarray) -> MatchResult:
    """Compact reciprocal pairs to the front of a (Kn, 2) buffer
    (order = ascending index in cloud0, same as the reference's append
    loop, ``matcher.py:37-48``)."""
    kn = nn0in1.shape[0]
    idx = jnp.arange(kn, dtype=jnp.int32)
    order = jnp.argsort(~mutual, stable=True)
    pairs = jnp.stack([idx, nn0in1], axis=1)[order]
    count = jnp.sum(mutual).astype(jnp.int32)
    mask = jnp.arange(kn) < count
    pairs = jnp.where(mask[:, None], pairs, 0)
    return MatchResult(pairs=pairs, mask=mask, count=count)


def mutual_match(inv0: jnp.ndarray, inv1: jnp.ndarray) -> MatchResult:
    """inv0/inv1: (Kn, C) invariant descriptors (all rows valid).

    Returns reciprocal matches, compacted to the front of a (Kn, 2)
    buffer.
    """
    return compact_matches(*nn_and_reciprocity(inv0, inv1))


def group_mean_inv(eqv: jnp.ndarray) -> jnp.ndarray:
    """(Kn, 60, C) equivariant -> (Kn, C) invariant by group mean
    (reference ``matcher.py:35-36``; note: *not* re-normalized)."""
    return jnp.mean(eqv, axis=1)
