"""Integration test: full PipelineRunner.evaluate on a synthetic scene.

Three fragments; fragment 2 is a group-rotation of fragment 0 (exact
equivariance => matching works untrained); fragment 1 is unrelated.
The protocol only scores non-consecutive pairs, i.e. (0, 2), which the
pipeline must register. Exercises every stage incl. disk caching,
pre.log writing, FMR, and the Redwood RR benchmark — the same spine as
the reference's Evaluator_PartI (tests/evaluator.py:75-101).
"""

import dataclasses
import os

import numpy as np
import pytest

from yoho_tpu.config import default_config
from yoho_tpu.data.dataset import FragmentDataset
from yoho_tpu.group import get_group
from yoho_tpu.utils.ply import write_ply
from yoho_tpu.utils.so3 import compute_R_diff


@pytest.fixture(scope="module")
def synth_scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scene")
    rng = np.random.default_rng(0)
    G = get_group()
    gi = 31
    R = G.rotations[gi]
    n = 2000
    cloud0 = rng.uniform(-0.9, 0.9, size=(n, 3))
    cloud1 = rng.uniform(-0.9, 0.9, size=(n, 3))
    cloud2 = cloud0 @ R.T  # pts2 = R @ pts0
    root = tmp / "sceneX"
    pc_dir = root / "PointCloud"
    pc_dir.mkdir(parents=True)
    for k, c in enumerate([cloud0, cloud1, cloud2]):
        write_ply(str(pc_dir / f"cloud_bin_{k}.ply"), c)

    def T_of(Rm):  # transform with R @ pts_id1 + t = pts_id0
        return np.concatenate([Rm, np.zeros((3, 1))], axis=1)

    pairs = {(0, 1): T_of(np.eye(3)), (0, 2): T_of(R.T), (1, 2): T_of(np.eye(3))}
    with open(pc_dir / "gt.log", "w") as f:
        for (i, j), T in pairs.items():
            f.write(f"{i}\t{j}\t3\n")
            T4 = np.eye(4)
            T4[:3] = T
            for r in range(4):
                f.write("\t".join(str(x) for x in T4[r]) + "\n")
    with open(pc_dir / "gt.info", "w") as f:
        for (i, j), _ in pairs.items():
            f.write(f"{i}\t{j}\t3\n")
            for r in range(6):
                f.write("\t".join(str(x) for x in (np.eye(6) * 500.0)[r]) + "\n")
    # matching keypoints for 0 and 2 (same physical points), random for 1
    key_idx = rng.choice(n, 256, replace=False)
    kdir = root / "Keypoints"
    kdir.mkdir()
    for k in range(3):
        np.savetxt(str(kdir / f"cloud_bin_{k}Keypoints.txt"), key_idx)
    return str(root), gi, R


def test_runner_end_to_end(synth_scene, tmp_path):
    import jax

    root, gi, R = synth_scene
    cfg = default_config()
    cfg = dataclasses.replace(cfg)
    cfg.backbone = dataclasses.replace(cfg.backbone, voxel_size=0.05)
    cfg.pad = dataclasses.replace(cfg.pad, max_voxels=4096, num_keypoints=256)
    cfg.ransac = dataclasses.replace(cfg.ransac, max_iter=200)

    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.part1 import PartINetwork
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.pipeline.runner import PipelineRunner

    import jax.numpy as jnp

    fcgf = SparseResUNet(cfg.backbone)
    part1 = PartINetwork(cfg.part1)
    pts = jnp.zeros((4096, 3), jnp.float32)
    g0, _ = jax.jit(lambda p: build_grid(p, cfg.backbone.voxel_size, 10))(pts)
    plan0 = jax.jit(lambda g: build_unet_plan(g, cfg.backbone.conv1_kernel_size))(g0)
    fcgf_vars = fcgf.init(jax.random.PRNGKey(0), jnp.ones((4096, 1), jnp.float32), plan0, False)
    p1_vars = part1.init(jax.random.PRNGKey(1), jnp.zeros((4, 60, 32), jnp.float32), False)

    ds = FragmentDataset(root, 3)
    ds.name = "synth/sceneX"
    datasets = {"wholesetname": "synth", "sceneX": ds}

    runner = PipelineRunner(cfg, fcgf_vars, p1_vars)
    cache = str(tmp_path / "cache")
    out = runner.evaluate(datasets, cache, estimator="yoho_c")

    # pair (0,2) is the only non-consecutive gt pair and must register
    assert out["registration_recall"] == 1.0
    # the estimated transform should match R.T closely
    d = np.load(
        os.path.join(cache, "Testset", "synth/sceneX", "Match", "YOHO_C",
                     f"{cfg.ransac.max_iter}iters", "0-2.npz")
    )
    assert compute_R_diff(R.T, d["trans"][:3, :3]) < 2.0
    # stage caches exist and rerun is idempotent (no recompute crash)
    out2 = runner.evaluate(datasets, cache, estimator="yoho_c")
    assert out2["registration_recall"] == 1.0
    # FMR: matched keypoints of (0,2) should be mostly correct
    assert out["FMR"] >= 0.0  # defined; value depends on random pair (0,1),(1,2)
