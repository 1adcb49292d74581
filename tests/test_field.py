"""TensorField (float-coordinate field) semantics vs a numpy oracle
(reference ``MinkowskiTensorField.py``; ``coordinate_map_cpu.hpp:947``)."""

import numpy as np

import jax
import jax.numpy as jnp

from yoho_tpu.field import TensorField, field_from_points
from yoho_tpu.ops.sparse_ops import trilinear_interpolate


def _oracle_sparse(points, feats, voxel_size):
    keys = np.floor(points / voxel_size).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    out = np.zeros((len(uniq), feats.shape[1]))
    cnt = np.zeros(len(uniq))
    for i, v in enumerate(inv):
        out[v] += feats[i]
        cnt[v] += 1
    return uniq, out / cnt[:, None], inv


def test_sparse_is_voxel_mean(rng):
    n, pad, C = 300, 512, 8
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, C)).astype(np.float32)
    fpad = np.zeros((pad, C), np.float32)
    fpad[:n] = feats
    ppad = np.zeros((pad, 3), np.float32)
    ppad[:n] = pts
    vs = 0.1
    tf = field_from_points(jnp.asarray(ppad), jnp.asarray(fpad), n)
    st, inverse = jax.jit(lambda f: f.sparse(vs, pad))(tf)

    uniq, mean_feats, inv = _oracle_sparse(pts, feats, vs)
    assert int(st.grid.count) == len(uniq)
    got_c = np.asarray(st.grid.coords)[: len(uniq), 1:]
    order = np.lexsort(uniq.T[::-1])
    np.testing.assert_array_equal(np.sort(got_c, axis=0), np.sort(uniq, axis=0))
    # voxel means match: compare per-point via the inverse map
    got_inv = np.asarray(inverse)[:n]
    np.testing.assert_allclose(
        np.asarray(st.feats)[got_inv], mean_feats[inv], rtol=1e-5, atol=1e-5
    )


def test_slice_roundtrip(rng):
    """sparse() then slice() gives every point its voxel's mean feature."""
    n, pad, C = 200, 256, 4
    pts = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, C)).astype(np.float32)
    ppad = np.zeros((pad, 3), np.float32)
    ppad[:n] = pts
    fpad = np.zeros((pad, C), np.float32)
    fpad[:n] = feats
    vs = 0.1
    tf = field_from_points(jnp.asarray(ppad), jnp.asarray(fpad), n)
    st, inverse = tf.sparse(vs, pad)
    sliced = tf.slice(st, vs)
    want = np.asarray(st.feats)[np.asarray(inverse)[:n]]
    np.testing.assert_allclose(np.asarray(sliced.feats)[:n], want, atol=1e-6)
    # invalid rows stay zero
    assert np.abs(np.asarray(sliced.feats)[n:]).max() == 0


def test_features_at_coordinates_interpolates(rng):
    """Trilinear field sampling agrees with a linear function of space
    (exact for trilinear) — ME features_at_coordinates semantics."""
    pad = 512
    g = np.stack(
        np.meshgrid(np.arange(6), np.arange(6), np.arange(6), indexing="ij"), -1
    ).reshape(-1, 3)
    vs = 0.1
    pts = (g + 0.5) * vs  # voxel centers
    A = rng.normal(size=(3, 2)).astype(np.float32)
    feats = (pts @ A).astype(np.float32)
    ppad = np.zeros((pad, 3), np.float32)
    ppad[: len(pts)] = pts
    fpad = np.zeros((pad, 2), np.float32)
    fpad[: len(pts)] = feats
    tf = field_from_points(jnp.asarray(ppad), jnp.asarray(fpad), len(pts))
    st, _ = tf.sparse(vs, pad)
    q = rng.uniform(0.15, 0.45, (40, 3)).astype(np.float32)
    got = np.asarray(
        trilinear_interpolate(st.grid, st.feats, jnp.asarray(q), vs)
    )
    np.testing.assert_allclose(got, q @ A, rtol=1e-4, atol=1e-4)


def test_sparse_inverse_pad_sentinel_when_grid_full(rng):
    """Invalid/unmappable points' inverse entry must be the OUT-OF-RANGE
    sentinel (== out_size), never an in-range row (advisor round-4
    finding: the old out_size-1 sentinel aliased the reserved zero row
    and reads the contract as a live-row association when the bucket
    saturates)."""
    vs = 0.1
    # 8 points in 8 distinct voxels; bucket 8 holds at most 7 voxels
    # (row out_size-1 is the reserved zero row), so one voxel drops
    pts = (np.arange(8)[:, None] * np.array([[1.0, 0, 0]])).astype(np.float32) * vs
    pad = 12
    ppad = np.zeros((pad, 3), np.float32)
    ppad[:8] = pts
    # pad rows coincide with voxel 0's position: without masking they
    # would look like valid members of a live voxel
    feats = np.ones((pad, 2), np.float32)
    tf = field_from_points(jnp.asarray(ppad), jnp.asarray(feats), 8)
    st, inverse = jax.jit(lambda f: f.sparse(vs, 8))(tf)
    assert int(st.grid.count) == 7 and int(st.grid.dropped) == 1
    inv = np.asarray(inverse)
    # 7 points land in live rows; the dropped voxel's point and every
    # pad row get the out-of-range sentinel
    assert ((inv[:8] < 7) | (inv[:8] == 8)).all(), inv[:8]
    assert (inv[:8] == 8).sum() == 1
    assert (inv[8:] == 8).all(), inv[8:]
    # voxel 0's mean is unaffected by the coincident pad rows
    np.testing.assert_allclose(np.asarray(st.feats)[inv[0]], [1.0, 1.0])
