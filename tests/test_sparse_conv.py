"""Sparse conv vs brute force + dense-shift reference; gradient check.

Mirrors the reference's test tiers: analytic small cases + gradcheck
(``MinkowskiEngine/tests/python/convolution.py``,
``MinkowskiEngine/utils/gradcheck.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoho_tpu.ops.kernel_map import build_kernel_map, hypercube_offsets
from yoho_tpu.ops.sparse_conv import masked_mean_var, sparse_conv
from yoho_tpu.ops.voxel import build_grid, stride_grid


def _make(rng, n=200, pad=256, vs=0.1, span=0.5):
    cloud = rng.uniform(-span, span, size=(n, 3)).astype(np.float32)
    pts = jnp.zeros((pad, 3), jnp.float32).at[:n].set(jnp.asarray(cloud))
    grid, _ = jax.jit(lambda p: build_grid(p, vs, n))(pts)
    return grid


def _np_sparse_conv(coords, feats, W, kernel_size, step=1):
    """Brute-force dict-based gather conv."""
    offs = hypercube_offsets(kernel_size)
    lut = {tuple(c): i for i, c in enumerate(coords)}
    M, K = len(coords), len(offs)
    Cout = W.shape[-1]
    out = np.zeros((M, Cout))
    for m, c in enumerate(coords):
        for k, off in enumerate(offs):
            q = (c[0], c[1] + off[0] * step, c[2] + off[1] * step, c[3] + off[2] * step)
            j = lut.get(q)
            if j is not None:
                out[m] += feats[j] @ W[k]
    return out


def test_conv_matches_bruteforce(rng):
    grid = _make(rng)
    c = int(grid.count)
    kmap = jax.jit(lambda g: build_kernel_map(g, g, 3))(grid)
    Cin, Cout = 4, 6
    feats = rng.normal(size=(grid.coords.shape[0], Cin)).astype(np.float32)
    feats[c:] = 0
    W = rng.normal(size=(27, Cin, Cout)).astype(np.float32)
    out = np.asarray(sparse_conv(jnp.asarray(feats), kmap, jnp.asarray(W)))
    ref = _np_sparse_conv(np.asarray(grid.coords)[:c], feats[:c], W, 3)
    np.testing.assert_allclose(out[:c], ref, rtol=2e-4, atol=2e-4)


def test_conv_strided(rng):
    grid = _make(rng)
    coarse, _ = jax.jit(lambda g: stride_grid(g, 2))(grid)
    kmap = jax.jit(lambda g, c: build_kernel_map(g, c, 3))(grid, coarse)
    c = int(grid.count)
    cc = int(coarse.count)
    Cin, Cout = 3, 5
    feats = rng.normal(size=(grid.coords.shape[0], Cin)).astype(np.float32)
    feats[c:] = 0
    W = rng.normal(size=(27, Cin, Cout)).astype(np.float32)
    out = np.asarray(sparse_conv(jnp.asarray(feats), kmap, jnp.asarray(W)))
    # brute force: out coords = coarse coords, neighbors at fine stride
    offs = hypercube_offsets(3)
    lut = {tuple(cd): i for i, cd in enumerate(np.asarray(grid.coords)[:c])}
    ref = np.zeros((cc, Cout))
    for m, cd in enumerate(np.asarray(coarse.coords)[:cc]):
        for k, off in enumerate(offs):
            q = (cd[0], cd[1] + off[0], cd[2] + off[1], cd[3] + off[2])
            j = lut.get(q)
            if j is not None:
                ref[m] += feats[j] @ W[k]
    np.testing.assert_allclose(out[:cc], ref, rtol=2e-4, atol=2e-4)


def test_conv_gradients_finite_difference(rng):
    """double-precision finite differences on a tiny case, the analog of
    ME's gradcheck harness (``MinkowskiEngine/utils/gradcheck.py``)."""
    with jax.enable_x64():
        cloud = rng.uniform(-0.2, 0.2, size=(25, 3)).astype(np.float32)
        pts = jnp.zeros((32, 3), jnp.float32).at[:25].set(jnp.asarray(cloud))
        grid, _ = jax.jit(lambda p: build_grid(p, 0.1, 25))(pts)
        kmap = jax.jit(lambda g: build_kernel_map(g, g, 3))(grid)
        c = int(grid.count)
        Cin, Cout = 2, 3
        feats0 = rng.normal(size=(32, Cin))
        feats0[c:] = 0
        W0 = rng.normal(size=(27, Cin, Cout))

        def loss(feats, W):
            out = sparse_conv(feats, kmap, W)
            return jnp.sum(jnp.sin(out))

        gf, gW = jax.grad(loss, argnums=(0, 1))(jnp.asarray(feats0), jnp.asarray(W0))
        eps = 1e-6
        for _ in range(10):
            i, j = rng.integers(0, c), rng.integers(0, Cin)
            fp = feats0.copy()
            fp[i, j] += eps
            fm = feats0.copy()
            fm[i, j] -= eps
            num = (
                loss(jnp.asarray(fp), jnp.asarray(W0))
                - loss(jnp.asarray(fm), jnp.asarray(W0))
            ) / (2 * eps)
            np.testing.assert_allclose(float(gf[i, j]), float(num), rtol=1e-5, atol=1e-8)
        for _ in range(10):
            k, i, j = rng.integers(0, 27), rng.integers(0, Cin), rng.integers(0, Cout)
            Wp = W0.copy()
            Wp[k, i, j] += eps
            Wm = W0.copy()
            Wm[k, i, j] -= eps
            num = (
                loss(jnp.asarray(feats0), jnp.asarray(Wp))
                - loss(jnp.asarray(feats0), jnp.asarray(Wm))
            ) / (2 * eps)
            np.testing.assert_allclose(float(gW[k, i, j]), float(num), rtol=1e-5, atol=1e-8)


def test_masked_mean_var(rng):
    feats = rng.normal(size=(64, 8)).astype(np.float32)
    mask = np.zeros(64, bool)
    mask[:40] = True
    mean, var = masked_mean_var(jnp.asarray(feats), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(mean), feats[:40].mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), feats[:40].var(0), atol=1e-5)


def test_knn(rng):
    from yoho_tpu.ops.knn import knn_search, nn_search

    base = rng.normal(size=(500, 3)).astype(np.float32)
    base_pad = np.zeros((512, 3), np.float32)
    base_pad[:500] = base
    mask = np.arange(512) < 500
    q = rng.normal(size=(64, 3)).astype(np.float32)
    idx = np.asarray(
        nn_search(jnp.asarray(q), jnp.asarray(base_pad), jnp.asarray(mask), chunk=32)
    )
    d = np.linalg.norm(q[:, None] - base[None], axis=-1)
    np.testing.assert_array_equal(idx, d.argmin(1))
    dk, ik = knn_search(jnp.asarray(q), jnp.asarray(base_pad), jnp.asarray(mask), k=3, chunk=32)
    np.testing.assert_array_equal(np.asarray(ik), np.argsort(d, axis=1)[:, :3])


def test_conv_variants_agree(rng):
    """All sparse_conv variants agree when the zero-row invariant holds
    (feats zero on padding rows) — the model maintains that invariant."""
    import jax.numpy as jnp

    from yoho_tpu.ops.kernel_map import build_kernel_map
    from yoho_tpu.ops.sparse_conv import sparse_conv
    from yoho_tpu.ops.voxel import build_grid

    cloud = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    pts = jnp.zeros((1024, 3), jnp.float32).at[:500].set(jnp.asarray(cloud))
    grid, _ = build_grid(pts, 0.1, 500)
    kmap = build_kernel_map(grid, grid, 3)
    n = grid.coords.shape[0]
    mask = (np.arange(n) < int(grid.count)).astype(np.float32)
    feats = (rng.normal(size=(n, 16)).astype(np.float32)) * mask[:, None]
    w = rng.normal(size=(27, 16, 8)).astype(np.float32) * 0.1
    ref = np.asarray(sparse_conv(jnp.asarray(feats), kmap, jnp.asarray(w), variant="im2col"))
    for v in ("einsum", "einsum_nomask", "unrolled"):
        out = np.asarray(sparse_conv(jnp.asarray(feats), kmap, jnp.asarray(w), variant=v))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5, err_msg=v)


@pytest.mark.slow
def test_bf16_inference_matches_f32():
    """bf16 compute dtype (BackboneConfig.dtype) must reproduce the f32
    descriptors within mixed-precision tolerance — the accuracy guard
    for the halved-HBM-traffic inference path (docs/PERF.md lever)."""
    import dataclasses

    import jax

    from yoho_tpu.config import default_config
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid

    rng = np.random.default_rng(4)
    pad = 4096
    pts = np.zeros((pad, 3), np.float32)
    n = 3000
    pts[:n] = rng.normal(size=(n, 3)).astype(np.float32) * 0.6
    cfg = default_config().backbone
    cfg_f32 = dataclasses.replace(cfg, dtype="float32")
    cfg_bf16 = dataclasses.replace(cfg, dtype="bfloat16")

    grid, _ = jax.jit(lambda p: build_grid(p, cfg.voxel_size, n))(jnp.asarray(pts))
    plan = jax.jit(lambda g: build_unet_plan(g, cfg.conv1_kernel_size))(grid)
    feats_in = jnp.ones((pad, 1), jnp.float32)
    m32 = SparseResUNet(cfg_f32)
    v = m32.init(jax.random.PRNGKey(0), feats_in, plan, False)
    f32_out = np.asarray(m32.apply(v, feats_in, plan, False))
    bf16_out = np.asarray(SparseResUNet(cfg_bf16).apply(v, feats_in, plan, False))
    assert f32_out.dtype == bf16_out.dtype == np.float32
    mask = np.abs(f32_out).sum(1) > 0
    cos = (f32_out[mask] * bf16_out[mask]).sum(1)  # both L2-normalized
    assert cos.min() > 0.98, f"bf16 descriptor diverged: min cos {cos.min()}"
    assert np.abs(f32_out - bf16_out).mean() < 0.02
    # train path ignores the compute dtype (always f32)
    t32, _ = m32.apply(v, feats_in, plan, True, mutable=["batch_stats"])
    tb, _ = SparseResUNet(cfg_bf16).apply(v, feats_in, plan, True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(t32), np.asarray(tb))
