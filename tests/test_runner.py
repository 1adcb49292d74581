"""Integration test: full PipelineRunner.evaluate on a synthetic scene.

Three fragments; fragment 2 is a group-rotation of fragment 0 (exact
equivariance => matching works untrained); fragment 1 is unrelated.
The protocol only scores non-consecutive pairs, i.e. (0, 2), which the
pipeline must register. Exercises every stage incl. disk caching,
pre.log writing, FMR, and the Redwood RR benchmark — the same spine as
the reference's Evaluator_PartI (tests/evaluator.py:75-101).
"""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run via -m slow

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


def test_runner_yoho_o_end_to_end(synth_scene, tmp_path):
    """Full PartII/YOHO-O spine: extract -> match -> DR-index ->
    extract_part2_poses -> estimate_scene('yoho_o') ->
    evaluate(with_part2=True) through the Redwood protocol (reference
    Evaluator_PartII, tests/evaluator.py:103-173).

    PartII's final FC layer is pinned to emit the identity quaternion,
    so each per-match pose is exactly the DR anchor rotation — exact
    for the group-rotated pair (0,2) — and YOHO-O must register it.
    """
    import jax
    import jax.numpy as jnp

    root, gi, R = synth_scene
    cfg = default_config()
    cfg.backbone = dataclasses.replace(cfg.backbone, voxel_size=0.05)
    cfg.pad = dataclasses.replace(cfg.pad, max_voxels=4096, num_keypoints=256)
    cfg.ransac = dataclasses.replace(cfg.ransac, max_iter=200)

    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.part1 import PartINetwork
    from yoho_tpu.models.part2 import PartIINetwork
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.pipeline.runner import PipelineRunner

    fcgf = SparseResUNet(cfg.backbone)
    part1 = PartINetwork(cfg.part1)
    part2 = PartIINetwork(cfg.part2)
    pts = jnp.zeros((4096, 3), jnp.float32)
    g0, _ = jax.jit(lambda p: build_grid(p, cfg.backbone.voxel_size, 10))(pts)
    plan0 = jax.jit(lambda g: build_unet_plan(g, cfg.backbone.conv1_kernel_size))(g0)
    fcgf_vars = fcgf.init(
        jax.random.PRNGKey(0), jnp.ones((4096, 1), jnp.float32), plan0, False
    )
    p1_vars = part1.init(
        jax.random.PRNGKey(1), jnp.zeros((4, 60, 32), jnp.float32), False
    )
    f = jnp.zeros((4, 60, 32), jnp.float32)
    p2_vars = part2.init(
        jax.random.PRNGKey(2), f, f, f, f, jnp.zeros(4, jnp.int32), False
    )
    # pin the quaternion head: kernel=0, bias=(1,0,0,0) -> q = identity
    import flax

    p2_params = flax.core.unfreeze(p2_vars["params"]) if hasattr(
        flax.core, "unfreeze"
    ) else dict(p2_vars["params"])
    last = p2_params["Dense_2"]
    last["kernel"] = jnp.zeros_like(last["kernel"])
    last["bias"] = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    p2_vars = dict(p2_vars)
    p2_vars["params"] = p2_params

    ds = FragmentDataset(root, 3)
    ds.name = "synthO/sceneX"
    datasets = {"wholesetname": "synthO", "sceneX": ds}

    runner = PipelineRunner(cfg, fcgf_vars, p1_vars, p2_vars)
    cache = str(tmp_path / "cacheO")
    out = runner.evaluate(datasets, cache, estimator="yoho_o", with_part2=True)
    assert out["registration_recall"] == 1.0
    d = np.load(
        os.path.join(cache, "Testset", "synthO/sceneX", "Match", "YOHO_O",
                     f"{cfg.ransac.max_iter}iters", "0-2.npz")
    )
    assert compute_R_diff(R.T, d["trans"][:3, :3]) < 2.0
    # Trans_pre cache exists with (M, 3, 4) per-match transforms
    T = np.load(
        os.path.join(cache, "Testset", "synthO/sceneX", "Match", "Trans_pre",
                     "0-2.npy")
    )
    assert T.ndim == 3 and T.shape[1:] == (3, 4)
    # idempotent rerun
    out2 = runner.evaluate(datasets, cache, estimator="yoho_o", with_part2=True)
    assert out2["registration_recall"] == 1.0


def test_part2_poses_pins_swap_convention(synth_scene):
    """Regression-pin the feats0/feats1 swap: runner.part2_poses must
    feed PartII in the reference "afterrot" order — '0' slot = cloud 1
    side (reference batch_create, tests/extractor.py:125-138) — and
    compose R = deltaR @ R_anchor, t = k0 - R @ k1."""
    import jax
    import jax.numpy as jnp

    cfg = default_config()
    cfg.pad = dataclasses.replace(cfg.pad, max_voxels=4096, num_keypoints=8)

    from yoho_tpu.group import get_group
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.part1 import PartINetwork
    from yoho_tpu.models.part2 import PartIINetwork
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.pipeline.runner import PipelineRunner
    from yoho_tpu.utils.so3 import matrix_from_quaternion

    rng = np.random.default_rng(3)
    fcgf = SparseResUNet(cfg.backbone)
    part1 = PartINetwork(cfg.part1)
    part2 = PartIINetwork(cfg.part2)
    pts = jnp.zeros((4096, 3), jnp.float32)
    g0, _ = jax.jit(lambda p: build_grid(p, cfg.backbone.voxel_size, 10))(pts)
    plan0 = jax.jit(lambda g: build_unet_plan(g, cfg.backbone.conv1_kernel_size))(g0)
    fcgf_vars = fcgf.init(
        jax.random.PRNGKey(0), jnp.ones((4096, 1), jnp.float32), plan0, False
    )
    p1_vars = part1.init(
        jax.random.PRNGKey(1), jnp.zeros((4, 60, 32), jnp.float32), False
    )
    f0 = jnp.zeros((4, 60, 32), jnp.float32)
    p2_vars = part2.init(  # random weights: output depends on arg order
        jax.random.PRNGKey(2), f0, f0, f0, f0, jnp.zeros(4, jnp.int32), False
    )
    runner = PipelineRunner(cfg, fcgf_vars, p1_vars, p2_vars)

    B = 8
    bf0, bf1, af0, af1 = (
        jnp.asarray(rng.normal(size=(B, 60, 32)).astype(np.float32))
        for _ in range(4)
    )
    idx = jnp.asarray(rng.integers(0, 60, B).astype(np.int32))
    k0 = jnp.asarray(rng.uniform(-1, 1, (B, 3)).astype(np.float32))
    k1 = jnp.asarray(rng.uniform(-1, 1, (B, 3)).astype(np.float32))
    got = np.asarray(runner.part2_poses(bf0, bf1, af0, af1, idx, k0, k1))

    # reference convention, computed independently
    q = np.asarray(part2.apply(p2_vars, bf1, bf0, af1, af0, idx, False))
    Rg = get_group().rotations
    for m in range(B):
        R_res = matrix_from_quaternion(q[m])
        Rm = R_res @ Rg[int(idx[m])]
        t = np.asarray(k0[m]) - Rm @ np.asarray(k1[m])
        np.testing.assert_allclose(got[m, :, :3], Rm, atol=1e-5)
        np.testing.assert_allclose(got[m, :, 3], t, atol=1e-5)
