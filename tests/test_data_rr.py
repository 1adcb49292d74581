"""Data layer + RR protocol tests with synthetic golden fixtures."""

import os

import numpy as np
import pytest

from yoho_tpu.benchmark import rr
from yoho_tpu.data.dataset import FragmentDataset, get_datasets, parse_gt_log
from yoho_tpu.utils import so3
from yoho_tpu.utils.ply import read_ply, write_ply


def test_ply_roundtrip_binary(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "c.ply")
    write_ply(p, pts)
    out = read_ply(p)
    np.testing.assert_allclose(out, pts, atol=1e-6)


def test_ply_ascii(tmp_path, rng):
    pts = rng.normal(size=(10, 3))
    p = str(tmp_path / "a.ply")
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for row in pts:
            f.write(f"{row[0]} {row[1]} {row[2]}\n")
    out = read_ply(p)
    np.testing.assert_allclose(out, pts, atol=1e-6)


def _write_scene(tmp_path, name, n_frag, pairs_T, infos=None, rng=None):
    """Create a fragment-scene fixture with gt.log/gt.info/plys."""
    root = tmp_path / name
    pc_dir = root / "PointCloud"
    pc_dir.mkdir(parents=True)
    rng = rng or np.random.default_rng(0)
    for k in range(n_frag):
        write_ply(str(pc_dir / f"cloud_bin_{k}.ply"), rng.normal(size=(50, 3)))
    with open(pc_dir / "gt.log", "w") as f:
        for (i, j), T in pairs_T.items():
            f.write(f"{i}\t{j}\t{n_frag}\n")
            T4 = np.eye(4)
            T4[:3] = T
            for r in range(4):
                f.write(" ".join(str(x) for x in T4[r]) + "\n")
    with open(pc_dir / "gt.info", "w") as f:
        for (i, j), T in pairs_T.items():
            f.write(f"{i}\t{j}\t{n_frag}\n")
            info = np.eye(6) * 100.0 if infos is None else infos[(i, j)]
            for r in range(6):
                f.write("\t".join(str(x) for x in info[r]) + "\n")
    return str(root)


def _rand_T(rng):
    R = so3.random_rotation_matrix(rng)
    t = rng.normal(size=3)
    return np.concatenate([R, t[:, None]], axis=1)


def test_parse_gt_log_and_dataset(tmp_path, rng):
    pairs = {(0, 1): _rand_T(rng), (0, 2): _rand_T(rng), (1, 3): _rand_T(rng)}
    root = _write_scene(tmp_path, "sceneA", 4, pairs, rng=rng)
    ds = FragmentDataset(root, 4)
    assert set(ds.pair_ids) == {("0", "1"), ("0", "2"), ("1", "3")}
    np.testing.assert_allclose(ds.get_transform("0", "2"), pairs[(0, 2)], atol=1e-12)
    pc = ds.get_pc(0)
    assert pc.shape == (50, 3)
    # keypoint fallback: random sample persisted
    k1 = ds.get_kps(1)
    k1b = ds.get_kps(1)
    np.testing.assert_array_equal(k1, k1b)
    assert os.path.exists(os.path.join(root, "Keypoints", "cloud_bin_1Keypoints.txt"))


def test_evaluate_registration_golden(rng):
    """Hand-computed: 4 gt pairs, 2 non-consecutive valid; est gets one
    right and one badly wrong."""
    n_frag = 5
    ids = [(0, 1), (0, 2), (1, 3), (3, 4)]
    gt_T = {p: _rand_T(rng) for p in ids}
    gt_pairs = np.asarray([[i, j, n_frag] for i, j in ids], dtype=object)
    gt_traj = np.stack(
        [np.vstack([gt_T[p], [0, 0, 0, 1]]) for p in ids]
    )
    gt_info = np.stack([np.eye(6) * 100 for _ in ids])
    # estimated: pair (0,2) exact; pair (1,3) off by 1m translation
    bad = gt_traj[2].copy()
    bad[0, 3] += 1.0
    est_pairs = np.asarray([[0, 2, n_frag], [1, 3, n_frag]], dtype=object)
    est_traj = np.stack([gt_traj[1], bad])
    prec, rec, flags, errors = rr.evaluate_registration(
        n_frag, est_traj, est_pairs, gt_pairs, gt_traj, gt_info, err2=0.2
    )
    # valid gt = (0,2) and (1,3): n_gt = 2; good = 1
    assert rec == 0.5
    assert prec == 0.5
    assert flags == [0, 1]
    assert errors[0] < 1e-6 and errors[1] > 0.2


def test_benchmark_end_to_end(tmp_path, rng):
    """Full file-protocol round trip: gt + pre.log -> RR."""
    ids = [(0, 1), (0, 2), (0, 3), (1, 3)]
    gt_T = {p: _rand_T(rng) for p in ids}
    root = _write_scene(tmp_path / "origin", "sceneB", 4, gt_T, rng=rng)
    ds = FragmentDataset(root, 4)
    ds.name = "synth/sceneB"
    datasets = {"wholesetname": "synth", "sceneB": ds}

    cache = tmp_path / "cache"
    pre_dir = cache / "Testset" / "synth/sceneB" / "Match" / "YOHO_C" / "7iters"
    pre_dir.mkdir(parents=True)
    # predict all 4 pairs: (0,2) and (0,3) exact, (1,3) wrong
    est = []
    for i, j in ids:
        T = np.vstack([gt_T[(i, j)], [0, 0, 0, 1]])
        if (i, j) == (1, 3):
            T = T.copy()
            T[1, 3] += 2.0
        est.append(((i, j), T[:3]))
    rr.write_trajectory(str(pre_dir / "pre.log"), [p for p, _ in est], [t for _, t in est], 4)

    mean_rr, flags, errors = rr.benchmark(
        datasets, str(cache), 7, yoho_sign="YOHO_C", rr_dist_threshold=0.2
    )
    # valid non-consecutive gt: (0,2), (0,3), (1,3) -> 3; good: 2
    assert abs(mean_rr - 2 / 3) < 1e-9
    assert os.path.exists(
        cache / "Testset" / "synth" / "Eval_results" / "YOHO_C_RR" / "7iters" / "result.txt"
    )


def test_compute_transformation_err_identity():
    assert rr.compute_transformation_err(np.eye(4), np.eye(6)) == 0.0


def test_rotation_error_deg(rng):
    R1 = np.stack([so3.random_rotation_matrix(rng) for _ in range(5)])
    axis = rng.normal(size=3)
    d = so3.axis_angle_matrix(axis, np.deg2rad(33.0))
    R2 = np.einsum("bij,jk->bik", R1, d)
    err = rr.rotation_error_deg(R1, R2)
    np.testing.assert_allclose(err, 33.0, atol=1e-6)


def test_get_datasets_unknown():
    with pytest.raises(NotImplementedError):
        get_datasets("nope", "/tmp")
