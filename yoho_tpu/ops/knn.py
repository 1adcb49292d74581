"""Brute-force nearest-neighbor search on the MXU.

Replaces the reference's chunked GPU brute force
(``/root/reference/utils/knn_search.py:13-162``). Distances come from
one query x base matmul; invalid base rows are masked to +inf. Queries
are processed in chunks under ``lax.map`` to bound memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nn_search(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    base_mask: jnp.ndarray,
    chunk: int = 1024,
) -> jnp.ndarray:
    """1-NN index of each query in base (masked). queries (Q, D),
    base (N, D), base_mask (N,) bool -> int32 (Q,).

    Q must be divisible by ``chunk`` (pad upstream if needed).
    """
    q = queries.shape[0]
    assert q % chunk == 0, f"query count {q} not divisible by chunk {chunk}"
    base_sq = jnp.sum(base * base, axis=1)  # (N,)
    penalty = jnp.where(base_mask, 0.0, jnp.inf)

    def one_chunk(qc):
        # ||q - b||^2 = ||q||^2 - 2 q.b + ||b||^2 ; ||q||^2 constant per row
        d = base_sq[None, :] - 2.0 * (qc @ base.T) + penalty[None, :]
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    idx = jax.lax.map(one_chunk, queries.reshape(-1, chunk, queries.shape[1]))
    return idx.reshape(q)


def knn_search(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    base_mask: jnp.ndarray,
    k: int,
    chunk: int = 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN (distances, indices); same masking semantics as nn_search."""
    q = queries.shape[0]
    assert q % chunk == 0
    base_sq = jnp.sum(base * base, axis=1)
    penalty = jnp.where(base_mask, 0.0, jnp.inf)

    def one_chunk(qc):
        d = base_sq[None, :] - 2.0 * (qc @ base.T) + penalty[None, :]
        neg_top, idx = jax.lax.top_k(-d, k)
        return -neg_top, idx.astype(jnp.int32)

    d, idx = jax.lax.map(one_chunk, queries.reshape(-1, chunk, queries.shape[1]))
    return d.reshape(q, k), idx.reshape(q, k)
