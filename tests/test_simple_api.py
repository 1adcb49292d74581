"""Lightweight feature API (``yoho_tpu/simple.py``; reference
``simple_yoho/fcgf_feat.py:51-55``, ``yoho_extract.py:73-77``)."""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: 60-rotation e2e extractors

import dataclasses

import numpy as np
import pytest

from yoho_tpu.config import default_config
from yoho_tpu.simple import FCGFExtractor, YOHOExtractor


def _tiny_cfg():
    cfg = default_config()
    cfg.pad = dataclasses.replace(
        cfg.pad, max_points=1024, max_voxels=512, voxel_buckets=(512,),
        num_keypoints=16,
    )
    cfg.backbone = dataclasses.replace(
        cfg.backbone, conv1_kernel_size=3, voxel_size=0.1
    )
    return cfg


def test_missing_checkpoint_is_an_error(tmp_path):
    with pytest.raises(FileNotFoundError):
        FCGFExtractor(model_dir=str(tmp_path), cfg=_tiny_cfg())


def test_fcgf_extractor_shapes(rng, tmp_path):
    ex = FCGFExtractor(model_dir=str(tmp_path), cfg=_tiny_cfg(), allow_random=True)
    pc = rng.uniform(-0.6, 0.6, (300, 3)).astype(np.float32)
    xyz, feats = ex.run(pc, voxel_size=0.1)
    n_unique = len(np.unique(np.floor(pc / 0.1).astype(int), axis=0))
    assert len(xyz) == n_unique
    assert feats.shape == (n_unique, 32)
    # normalize_feature=True: unit-norm descriptors
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-4)
    # returned positions are actual input points (one rep per voxel)
    d = np.min(
        np.linalg.norm(xyz[:, None, :] - pc[None, :, :], axis=-1), axis=1
    )
    assert d.max() < 1e-6


def test_yoho_extractor_invariance(rng, tmp_path):
    """inv descriptors must be (architecturally) invariant when the
    cloud is rotated by an icosahedral group element — even with random
    weights (reference equivariance self-check, utils/network.py:290)."""
    from yoho_tpu.group import get_group

    ex = YOHOExtractor(model_dir=str(tmp_path), cfg=_tiny_cfg(), allow_random=True)
    pc = rng.uniform(-0.5, 0.5, (250, 3)).astype(np.float32)
    kpts, inv, eqv = ex.run(pc, voxel_size=0.1, nkpts=16)
    assert kpts.shape == (16, 3) and inv.shape == (16, 32)
    assert eqv.shape == (16, 60, 32)

    R = get_group().rotations[7]
    ex2 = YOHOExtractor(model_dir=str(tmp_path), cfg=_tiny_cfg(),
                        allow_random=True, seed=0)
    # same rng seed -> same keypoint *indices* -> rotated same keypoints
    kpts2, inv2, _ = ex2.run(pc @ R.T, voxel_size=0.1, nkpts=16)
    np.testing.assert_allclose(kpts2, kpts @ R.T, atol=1e-6)
    # voxel occupancy changes under rotation, so invariance is
    # approximate at voxel granularity — but descriptors must be close
    err = np.linalg.norm(inv2 - inv, axis=1) / np.maximum(
        np.linalg.norm(inv, axis=1), 1e-6
    )
    assert np.median(err) < 0.35, err
