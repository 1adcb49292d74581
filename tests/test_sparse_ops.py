"""Tests for the extended sparse-op family + SparseTensor API."""

import jax
import jax.numpy as jnp
import numpy as np

from yoho_tpu.api import SparseTensor
from yoho_tpu.ops import sparse_ops
from yoho_tpu.ops.kernel_map import build_kernel_map
from yoho_tpu.ops.voxel import build_grid, stride_grid


def _grid(rng, n=300, pad=512, vs=0.1, span=0.4):
    cloud = rng.uniform(-span, span, size=(n, 3)).astype(np.float32)
    pts = jnp.zeros((pad, 3), jnp.float32).at[:n].set(jnp.asarray(cloud))
    grid, first = jax.jit(lambda p: build_grid(p, vs, n))(pts)
    return grid, pts, first


def test_local_pool_modes(rng):
    grid, pts, _ = _grid(rng)
    c = int(grid.count)
    kmap = jax.jit(lambda g: build_kernel_map(g, g, 3))(grid)
    feats = rng.normal(size=(512, 4)).astype(np.float32)
    feats[c:] = 0
    fj = jnp.asarray(feats)
    out_max = np.asarray(sparse_ops.local_pool(fj, kmap, "max"))
    out_sum = np.asarray(sparse_ops.local_pool(fj, kmap, "sum"))
    out_avg = np.asarray(sparse_ops.local_pool(fj, kmap, "avg"))
    idx = np.asarray(kmap.in_idx)
    val = np.asarray(kmap.valid)
    for m in range(0, c, 17):
        rows = idx[val[:, m], m]
        np.testing.assert_allclose(out_max[m], feats[rows].max(0), atol=1e-6)
        np.testing.assert_allclose(out_sum[m], feats[rows].sum(0), atol=1e-5)
        np.testing.assert_allclose(out_avg[m], feats[rows].mean(0), atol=1e-5)


def test_local_pool_argmax(rng):
    grid, pts, _ = _grid(rng)
    kmap = jax.jit(lambda g: build_kernel_map(g, g, 3))(grid)
    feats = jnp.asarray(rng.normal(size=(512, 3)).astype(np.float32))
    out, rows = sparse_ops.local_pool_argmax(feats, kmap)
    ref = sparse_ops.local_pool(feats, kmap, "max")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    c = int(grid.count)
    got = np.asarray(feats)[np.asarray(rows)[:c], np.arange(3)[None, :]]
    np.testing.assert_allclose(got, np.asarray(out)[:c], atol=1e-6)


def test_global_pool_and_broadcast(rng):
    n = 64
    feats = rng.normal(size=(n, 5)).astype(np.float32)
    batch = (np.arange(n) % 3).astype(np.int32)
    mask = np.ones(n, bool)
    mask[-10:] = False
    out = np.asarray(
        sparse_ops.global_pool(
            jnp.asarray(feats), jnp.asarray(batch), jnp.asarray(mask), 3, "avg"
        )
    )
    for b in range(3):
        sel = (batch == b) & mask
        np.testing.assert_allclose(out[b], feats[sel].mean(0), atol=1e-5)
    vec = rng.normal(size=(3, 5)).astype(np.float32)
    bout = np.asarray(
        sparse_ops.broadcast(jnp.asarray(feats), jnp.asarray(batch), jnp.asarray(vec), "add")
    )
    np.testing.assert_allclose(bout, feats + vec[batch], atol=1e-6)


def test_prune(rng):
    grid, pts, _ = _grid(rng)
    c = int(grid.count)
    feats = jnp.asarray(rng.normal(size=(512, 4)).astype(np.float32))
    keep = jnp.asarray(rng.random(512) < 0.5)
    new_grid, new_feats = jax.jit(sparse_ops.prune)(grid, feats, keep)
    kept = np.asarray(keep)[:c]
    assert int(new_grid.count) == kept.sum()
    np.testing.assert_array_equal(
        np.asarray(new_grid.coords)[: kept.sum()],
        np.asarray(grid.coords)[:c][kept],
    )
    np.testing.assert_allclose(
        np.asarray(new_feats)[: kept.sum()], np.asarray(feats)[:c][kept], atol=0
    )


def test_union(rng):
    ga, _, _ = _grid(rng, n=100, pad=256, span=0.2)
    gb, _, _ = _grid(np.random.default_rng(7), n=100, pad=256, span=0.2)
    fa = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    fb = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    fa = fa * (jnp.arange(256) < ga.count)[:, None]
    fb = fb * (jnp.arange(256) < gb.count)[:, None]
    g, f = jax.jit(sparse_ops.union)(ga, fa, gb, fb)
    ca, cb, cu = int(ga.count), int(gb.count), int(g.count)
    A = {tuple(c): i for i, c in enumerate(np.asarray(ga.coords)[:ca])}
    B = {tuple(c): i for i, c in enumerate(np.asarray(gb.coords)[:cb])}
    assert cu == len(set(A) | set(B))
    fnp = np.asarray(f)
    for i, coord in enumerate(np.asarray(g.coords)[:cu]):
        expect = np.zeros(3)
        if tuple(coord) in A:
            expect += np.asarray(fa)[A[tuple(coord)]]
        if tuple(coord) in B:
            expect += np.asarray(fb)[B[tuple(coord)]]
        np.testing.assert_allclose(fnp[i], expect, atol=1e-6)


def test_trilinear_interpolation_exact_on_linear_field(rng):
    """A feature field linear in position must be reproduced exactly at
    interior points (partition of unity + linearity)."""
    # full dense block of voxels => all 8 corners always exist
    xs = np.arange(0, 8)
    coords = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    pts = (coords + 0.5) * 0.1  # voxel centers at vs=0.1
    n = len(pts)
    pad = 1024
    pj = jnp.zeros((pad, 3), jnp.float32).at[:n].set(jnp.asarray(pts, jnp.float32))
    grid, first = jax.jit(lambda p: build_grid(p, 0.1, n))(pj)
    # linear field f(p) = [x, y, z] evaluated at the representative point
    feats = pj[first] * (jnp.arange(pad) < grid.count)[:, None]
    q = jnp.asarray(rng.uniform(0.15, 0.65, size=(50, 3)).astype(np.float32))
    out = sparse_ops.trilinear_interpolate(grid, feats, q, 0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), atol=1e-5)


def test_coo_spmm(rng):
    A = (rng.random((6, 5)) < 0.4) * rng.normal(size=(6, 5))
    r, c = np.nonzero(A)
    v = A[r, c]
    B = rng.normal(size=(5, 4))
    out = np.asarray(
        sparse_ops.coo_spmm(
            jnp.asarray(r, jnp.int32),
            jnp.asarray(c, jnp.int32),
            jnp.asarray(v, jnp.float32),
            jnp.ones(len(r), bool),
            jnp.asarray(B, jnp.float32),
            6,
        )
    )
    np.testing.assert_allclose(out, A @ B, atol=1e-5)


def test_sparse_tensor_api(rng):
    n, pad = 400, 512
    cloud = rng.uniform(-0.4, 0.4, size=(n, 3)).astype(np.float32)
    pts = jnp.zeros((pad, 3), jnp.float32).at[:n].set(jnp.asarray(cloud))
    feats = jnp.asarray(rng.normal(size=(pad, 6)).astype(np.float32))
    st = SparseTensor.from_points(pts, feats, 0.1, n)
    assert st.F.shape == (pad, 6)
    assert st.D == 3
    pooled = st.pool(kernel_size=3, mode="avg")
    assert pooled.tensor_stride == 2
    gp = st.global_pool(num_batches=1)
    assert gp.shape == (1, 6)
    dense = st.dense()
    assert dense.ndim == 4 and dense.shape[3] == 6
    # pytree round trip
    leaves, treedef = jax.tree_util.tree_flatten(st)
    st2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(st2.F), np.asarray(st.F))
