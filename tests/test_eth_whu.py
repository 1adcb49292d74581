"""ETH / WHU-TLS dataset configs exercised end-to-end on synthetic
stand-ins: `.txt` cloud loading, coarse voxel sizes, per-dataset knob
overrides (``config.for_dataset``, reference README.md:163-190), and
the WHU-TLS consecutive-pair RR branch (reference
``utils/RR_cal.py:330-331``)."""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run via -m slow

import dataclasses
import os

import numpy as np
import pytest

from yoho_tpu.config import default_config
from yoho_tpu.data.dataset import FragmentDataset
from yoho_tpu.group import get_group
from yoho_tpu.utils.so3 import compute_R_diff


def _write_scene(root, clouds, pairs, fmt="ply", n_keys=192):
    """clouds: list of (N,3); pairs: {(i,j): R} with R @ pts_j = pts_i."""
    pc_dir = os.path.join(root, "PointCloud")
    os.makedirs(pc_dir, exist_ok=True)
    for k, c in enumerate(clouds):
        if fmt == "ply":
            from yoho_tpu.utils.ply import write_ply

            write_ply(os.path.join(pc_dir, f"cloud_bin_{k}.ply"), c)
        else:  # ETH/WHU-TLS deliver txt clouds (dataset.py:137-138)
            np.savetxt(
                os.path.join(pc_dir, f"cloud_bin_{k}.txt"), c, delimiter=","
            )
    with open(os.path.join(pc_dir, "gt.log"), "w") as f:
        for (i, j), R in pairs.items():
            f.write(f"{i}\t{j}\t{len(clouds)}\n")
            T4 = np.eye(4)
            T4[:3, :3] = R
            for r in range(4):
                f.write("\t".join(str(x) for x in T4[r]) + "\n")
    with open(os.path.join(pc_dir, "gt.info"), "w") as f:
        for (i, j) in pairs:
            f.write(f"{i}\t{j}\t{len(clouds)}\n")
            for r in range(6):
                f.write("\t".join(str(x) for x in (np.eye(6) * 500.0)[r]) + "\n")
    kdir = os.path.join(root, "Keypoints")
    os.makedirs(kdir, exist_ok=True)
    key_idx = np.arange(n_keys) * (len(clouds[0]) // n_keys)
    for k in range(len(clouds)):
        np.savetxt(os.path.join(kdir, f"cloud_bin_{k}Keypoints.txt"), key_idx)


def _make_runner(cfg):
    import jax
    import jax.numpy as jnp

    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.part1 import PartINetwork
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.pipeline.runner import PipelineRunner

    fcgf = SparseResUNet(cfg.backbone)
    part1 = PartINetwork(cfg.part1)
    pts = jnp.zeros((4096, 3), jnp.float32)
    g0, _ = jax.jit(lambda p: build_grid(p, cfg.backbone.voxel_size, 10))(pts)
    plan0 = jax.jit(lambda g: build_unet_plan(g, cfg.backbone.conv1_kernel_size))(g0)
    fcgf_vars = fcgf.init(
        jax.random.PRNGKey(0), jnp.ones((4096, 1), jnp.float32), plan0, False
    )
    p1_vars = part1.init(
        jax.random.PRNGKey(1), jnp.zeros((4, 60, 32), jnp.float32), False
    )
    return PipelineRunner(cfg, fcgf_vars, p1_vars)


def test_eth_config_end_to_end(tmp_path):
    """ETH-style: txt clouds at outdoor scale, voxel 0.15, ransac_d 0.2,
    tau_3 0.5 — all applied via for_dataset('ETH')."""
    cfg = default_config().for_dataset("ETH")
    assert cfg.backbone.voxel_size == 0.15
    assert cfg.ransac.inlier_dist_c == 0.2
    assert cfg.ransac.rr_dist_threshold == 0.5
    cfg.pad = dataclasses.replace(cfg.pad, max_voxels=4096, num_keypoints=192)
    cfg.ransac = dataclasses.replace(cfg.ransac, max_iter=200)

    rng = np.random.default_rng(0)
    G = get_group()
    R = G.rotations[17]
    n = 1800
    cloud0 = rng.uniform(-2.5, 2.5, (n, 3))
    cloud1 = rng.uniform(-2.5, 2.5, (n, 3))
    cloud2 = cloud0 @ R.T
    root = str(tmp_path / "gazebo_synth")
    _write_scene(
        root, [cloud0, cloud1, cloud2],
        {(0, 1): np.eye(3), (0, 2): R.T, (1, 2): np.eye(3)}, fmt="txt",
    )
    ds = FragmentDataset(root, 3)
    ds.name = "ETH_synth/gazebo_synth"
    # txt fallback actually used
    assert not os.path.exists(os.path.join(root, "PointCloud", "cloud_bin_0.ply"))
    assert ds.get_pc(0).shape == (n, 3)

    runner = _make_runner(cfg)
    out = runner.evaluate(
        {"wholesetname": "ETH_synth", "gazebo_synth": ds},
        str(tmp_path / "cache"), estimator="yoho_c",
    )
    assert out["registration_recall"] == 1.0
    d = np.load(
        os.path.join(str(tmp_path / "cache"), "Testset", "ETH_synth/gazebo_synth",
                     "Match", "YOHO_C", "200iters", "0-2.npz")
    )
    assert compute_R_diff(R.T, d["trans"][:3, :3]) < 2.0


def test_whu_consecutive_pair_rr(tmp_path):
    """WHU-TLS: ONLY consecutive pairs exist; the 3DMatch protocol would
    score zero pairs, the WHU branch must score them
    (rr.py nonconsecutive=False; reference RR_cal.py:330-331)."""
    cfg = default_config().for_dataset("WHU-TLS")
    assert cfg.backbone.voxel_size == 0.8
    assert cfg.ransac.rr_dist_threshold == 1.0
    cfg.pad = dataclasses.replace(cfg.pad, max_voxels=4096, num_keypoints=192)
    cfg.ransac = dataclasses.replace(cfg.ransac, max_iter=200)

    rng = np.random.default_rng(1)
    G = get_group()
    R1, R2 = G.rotations[5], G.rotations[23]
    n = 1800
    cloud0 = rng.uniform(-14, 14, (n, 3))
    cloud1 = cloud0 @ R1.T  # pts1 = R1 @ pts0 -> gt(0,1) = R1^-1
    cloud2 = cloud1 @ R2.T
    root = str(tmp_path / "Park_synth")
    _write_scene(
        root, [cloud0, cloud1, cloud2],
        {(0, 1): R1.T, (1, 2): R2.T}, fmt="txt",
    )
    ds = FragmentDataset(root, 3)
    ds.name = "WHU-TLS/Park_synth"

    runner = _make_runner(cfg)
    out = runner.evaluate(
        {"wholesetname": "WHU-TLS", "Park_synth": ds},
        str(tmp_path / "cache"), estimator="yoho_c",
    )
    # both consecutive pairs must be scored AND registered
    assert out["registration_recall"] == 1.0
