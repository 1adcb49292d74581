"""Native host runtime vs numpy references (and the fallbacks)."""

import numpy as np
import pytest

from yoho_tpu import native


def test_native_compiles():
    assert native.available(), "g++ toolchain present in this image; must compile"


def test_prevoxelize_matches_numpy(rng):
    pts = rng.uniform(-2, 2, size=(5000, 3)).astype(np.float32)
    idx = native.prevoxelize_indices(pts, 0.1)
    vox = np.floor(pts / 0.1).astype(np.int64)
    ref_count = len(np.unique(vox, axis=0))
    assert len(idx) == ref_count
    # representatives cover every voxel exactly once
    assert len(np.unique(vox[idx], axis=0)) == ref_count
    # first-occurrence: no earlier point shares the voxel of its rep
    order = np.argsort(idx)
    lut = {}
    for i, v in enumerate(map(tuple, vox)):
        if v not in lut:
            lut[v] = i
    np.testing.assert_array_equal(np.sort(list(lut.values())), np.sort(idx))


def test_mine_nn_pairs(rng):
    pc0 = rng.uniform(-1, 1, size=(800, 3)).astype(np.float32)
    pc1 = pc0 + rng.normal(scale=0.004, size=pc0.shape).astype(np.float32)
    sel = rng.choice(800, 200, replace=False).astype(np.int64)
    pairs = native.mine_nn_pairs(pc0, sel, pc1, 0.02, 512)
    assert len(pairs) == 200
    d = np.linalg.norm(pc0[pairs[:, 0]] - pc1[pairs[:, 1]], axis=1)
    assert (d < 0.02).all()
    # true nearest neighbor
    ref = np.linalg.norm(pc0[sel][:, None] - pc1[None], axis=-1).argmin(1)
    np.testing.assert_array_equal(np.sort(pairs[:, 1]), np.sort(ref))


def test_radius_pairs(rng):
    a = rng.uniform(-0.5, 0.5, size=(300, 3)).astype(np.float32)
    b = rng.uniform(-0.5, 0.5, size=(300, 3)).astype(np.float32)
    pairs = native.radius_pairs(a, b, 0.05)
    d = np.linalg.norm(a[:, None] - b[None], axis=-1)
    ii, jj = np.where(d < 0.05)
    ref = set(zip(ii.tolist(), jj.tolist()))
    got = set(map(tuple, pairs.tolist()))
    assert got == ref


def test_pca_sigma_plane_vs_blob(rng):
    # flat plane -> sigma ~ 0 ; isotropic blob -> sigma ~ 1/3
    plane = rng.uniform(-1, 1, size=(4000, 3)).astype(np.float32)
    plane[:, 2] = 0
    blob = rng.normal(scale=0.2, size=(4000, 3)).astype(np.float32)
    keys = np.zeros((1, 3), np.float32)
    s_plane = native.pca_sigma(plane, keys, radius=0.3)
    s_blob = native.pca_sigma(blob, keys, radius=0.3)
    assert s_plane[0] < 0.01
    assert s_blob[0] > 0.15


def test_pca_sigma_matches_numpy_reference(rng):
    from yoho_tpu.data.trainset import local_pca_sigma

    pts = rng.uniform(-0.5, 0.5, size=(2000, 3)).astype(np.float32)
    keys = pts[rng.choice(2000, 20, replace=False)]
    s_native = native.pca_sigma(pts, keys, 0.3)
    s_np = local_pca_sigma(pts.astype(np.float64), keys.astype(np.float64), 0.3)
    np.testing.assert_allclose(s_native, s_np, atol=2e-4)
