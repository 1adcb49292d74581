"""Registration Recall benchmark — exact 3DMatch/Redwood protocol.

Numpy re-implementation of ``/root/reference/utils/RR_cal.py`` (itself
derived from the public 3DMatch benchmark scripts): trajectory/info
file parsing, covariance-weighted RMSE (``computeTransformationErr``),
non-consecutive-pair filtering (except WHU-TLS), per-scene
precision/recall and RRE/RTE statistics. nibabel's ``mat2quat`` is
replaced by our eigenvector quaternion (identical output).

Kept protocol-exact including quirks:
* ``gt_mask`` stores the gt row index, so a non-consecutive pair whose
  gt row is 0 is uncountable (``RR_cal.py:264-268``) — that's why the
  consecutive-allowed branch adds +1 and special-cases the first pair;
* recall denominator = number of *valid gt* pairs; precision over
  estimated pairs that hit the mask.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

from yoho_tpu.utils.so3 import quaternion_from_matrix


def rotation_error_deg(R1: np.ndarray, R2: np.ndarray) -> np.ndarray:
    """Batched geodesic rotation error (degrees) — reference
    ``rotation_error`` (RR_cal.py:13-33), numpy."""
    R_ = np.einsum("bji,bjk->bik", R1, R2)  # R1^T @ R2
    tr = np.einsum("bii->b", R_)
    e = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return np.degrees(np.arccos(e))


def translation_error(t1: np.ndarray, t2: np.ndarray) -> np.ndarray:
    """(b, 3, 1) x 2 -> (b,) L2 error (RR_cal.py:35-45)."""
    return np.linalg.norm(t1 - t2, axis=(1, 2))


def compute_transformation_err(trans: np.ndarray, info: np.ndarray) -> float:
    """Covariance-weighted squared RMSE of the relative transform
    (RR_cal.py:47-65)."""
    t = trans[:3, 3]
    r = trans[:3, :3]
    q = quaternion_from_matrix(r)
    er = np.concatenate([t, q[1:]], axis=0)
    p = er.reshape(1, 6) @ info @ er.reshape(6, 1) / info[0, 0]
    return float(p.item())


def read_trajectory(filename: str, dim: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Redwood .log -> (keys (n,3) str, traj (n,4,4)) (RR_cal.py:67-103)."""
    with open(filename) as f:
        lines = f.readlines()
    keys = lines[0 :: dim + 1]
    # whitespace-robust: real gt.log files mix tabs and spaces
    final_keys = np.asarray([[p.strip() for p in k.split()[0:3]] for k in keys])
    traj = [
        line.split()[0:dim] for i, line in enumerate(lines) if i % (dim + 1) != 0
    ]
    traj = np.asarray(traj, dtype=np.float64).reshape(-1, dim, dim)
    return final_keys, traj


def read_trajectory_info(filename: str, dim: int = 6) -> Tuple[int, np.ndarray]:
    """Redwood .info -> (n_fragments, cov (n,6,6)) (RR_cal.py:144-173)."""
    with open(filename) as fid:
        contents = fid.readlines()
    n_pairs = len(contents) // 7
    assert len(contents) == 7 * n_pairs
    info_list = []
    n_frame = 0
    for i in range(n_pairs):
        head = contents[i * 7].strip().split()
        n_frame = int(head[2])
        mat = np.concatenate(
            [
                np.fromstring(item, sep=" ").reshape(1, -1)
                for item in contents[i * 7 + 1 : i * 7 + 7]
            ],
            axis=0,
        )
        info_list.append(mat)
    cov = np.asarray(info_list, dtype=np.float64).reshape(-1, dim, dim)
    return n_frame, cov


def extract_corresponding_trajectories(
    est_pairs: np.ndarray, gt_pairs: np.ndarray, gt_traj: np.ndarray
) -> np.ndarray:
    """(RR_cal.py:175-193)."""
    ext = np.zeros((len(est_pairs), 4, 4))
    for i, pair in enumerate(est_pairs):
        pair[2] = gt_pairs[0][2]
        gt_idx = np.where((gt_pairs == pair).all(axis=1))[0]
        ext[i] = gt_traj[gt_idx]
    return ext


def write_trajectory(path: str, pairs, transforms, pair_num: int) -> None:
    """Write a Redwood pre.log (reference ``R_pre_log``,
    tests/estimator.py:12-24)."""
    with open(path, "w") as w:
        for (pc0, pc1), T in zip(pairs, transforms):
            w.write(f"{int(pc0)}\t{int(pc1)}\t{pair_num}\n")
            for r in range(3):
                w.write("\t".join(str(T[r, c]) for c in range(4)) + "\n")
            w.write("0.0\t0.0\t0.0\t1.0\n")


def evaluate_registration(
    num_fragment: int,
    result: np.ndarray,
    result_pairs: np.ndarray,
    gt_pairs: np.ndarray,
    gt: np.ndarray,
    gt_info: np.ndarray,
    err2: float = 0.2,
    nonconsecutive: bool = True,
):
    """(precision, recall, flags, errors) — RR_cal.py:236-317, exact."""
    err2 = err2**2
    gt_mask = np.zeros((num_fragment, num_fragment), dtype=np.int64)
    flags: List[int] = []
    errors: List[float] = []

    if nonconsecutive:
        for idx in range(gt_pairs.shape[0]):
            i, j = int(gt_pairs[idx, 0]), int(gt_pairs[idx, 1])
            if abs(j - i) > 1:
                gt_mask[i, j] = idx
        n_gt = int(np.sum(gt_mask > 0))
    else:
        for idx in range(gt_pairs.shape[0]):
            i, j = int(gt_pairs[idx, 0]), int(gt_pairs[idx, 1])
            gt_mask[i, j] = idx
        n_gt = int(np.sum(gt_mask > 0)) + 1

    good = 0
    n_res = 0
    if not nonconsecutive:
        start_check = 1
        n_res += 1
        pose = result[0]
        p = compute_transformation_err(np.linalg.inv(gt[0]) @ pose, gt_info[0])
        errors.append(float(np.sqrt(p)))
        if p <= err2:
            good += 1
            flags.append(0)
        else:
            flags.append(1)
    else:
        start_check = 0

    for idx in range(start_check, result_pairs.shape[0]):
        i, j = int(result_pairs[idx, 0]), int(result_pairs[idx, 1])
        pose = result[idx]
        if gt_mask[i, j] > 0:
            n_res += 1
            gt_idx = gt_mask[i, j]
            p = compute_transformation_err(
                np.linalg.inv(gt[gt_idx]) @ pose, gt_info[gt_idx]
            )
            errors.append(float(np.sqrt(p)))
            if p <= err2:
                good += 1
                flags.append(0)
            else:
                flags.append(1)
        else:
            flags.append(2)
    if n_res == 0:
        n_res += int(1e6)
    precision = good * 1.0 / n_res
    recall = good * 1.0 / n_gt
    return precision, recall, flags, errors


def benchmark(
    datasets: Dict,
    cache_dir: str,
    max_iter: int,
    yoho_sign: str = "YOHO_O",
    rr_dist_threshold: float = 0.2,
) -> Tuple[float, Dict, Dict]:
    """Whole-testset RR — reference ``benchmark`` (RR_cal.py:321-399).

    Reads ``{cache_dir}/Testset/{scene}/Match/{yoho_sign}/{max_iter}iters/pre.log``
    against each dataset's gt.log/gt.info; writes result.txt; returns
    (mean Registration Recall, flags, errors).
    """
    c_flags, c_errors = {}, {}
    re_per_scene = defaultdict(list)
    te_per_scene = defaultdict(list)
    re_all, te_all, precision, recall = [], [], [], []
    n_valids = []
    wholesetname = datasets["wholesetname"]
    nonconsecutive = wholesetname != "WHU-TLS"
    result_dir = os.path.join(
        cache_dir, "Testset", wholesetname, "Eval_results", f"{yoho_sign}_RR",
        f"{max_iter}iters",
    )
    os.makedirs(result_dir, exist_ok=True)
    with open(os.path.join(result_dir, "result.txt"), "w") as f:
        f.write("Scene\t prec.\t rec.\t re\t te\t samples\t\n")
        for scene, dataset in datasets.items():
            if scene == "wholesetname":
                continue
            pre_dir = os.path.join(
                cache_dir, "Testset", dataset.name, "Match", yoho_sign, f"{max_iter}iters"
            )
            gt_base = dataset.gt_dir[: dataset.gt_dir.rfind(".")]
            gt_pairs, gt_traj = read_trajectory(f"{gt_base}.log")
            n_valid = 0
            for ele in gt_pairs:
                if nonconsecutive:
                    n_valid += abs(int(ele[0]) - int(ele[1])) > 1
                else:
                    n_valid += 1
            n_valids.append(n_valid)
            n_fragments, gt_cov = read_trajectory_info(f"{gt_base}.info")
            est_pairs, est_traj = read_trajectory(os.path.join(pre_dir, "pre.log"))
            prec, rec, c_flag, c_error = evaluate_registration(
                n_fragments,
                est_traj,
                est_pairs,
                gt_pairs,
                gt_traj,
                gt_cov,
                err2=rr_dist_threshold,
                nonconsecutive=nonconsecutive,
            )
            c_flags[dataset.name] = c_flag
            c_errors[dataset.name] = c_error
            ext_gt = extract_corresponding_trajectories(est_pairs, gt_pairs, gt_traj)
            ok = np.array(c_flag) == 0
            re = rotation_error_deg(ext_gt[:, :3, :3], est_traj[:, :3, :3])[ok]
            te = translation_error(ext_gt[:, :3, 3:4], est_traj[:, :3, 3:4])[ok]
            if re.shape[0] == 0:
                re = np.ones(n_valid) * 180
            if te.shape[0] == 0:
                te = np.ones(n_valid)
            for k, v in [("mean", np.mean), ("median", np.median), ("min", np.min), ("max", np.max)]:
                re_per_scene[k].append(v(re))
                te_per_scene[k].append(v(te))
            re_all.extend(re.reshape(-1).tolist())
            te_all.extend(te.reshape(-1).tolist())
            precision.append(prec)
            recall.append(rec)
            f.write(
                "{}\t {:.3f}\t {:.3f}\t {:.3f}\t {:.3f}\t {:3d}\n".format(
                    dataset.name, prec, rec, np.median(re), np.median(te), n_valid
                )
            )
        weighted_precision = (np.array(n_valids) * np.array(precision)).sum() / np.sum(
            n_valids
        )
        mean_rr = float(np.mean(np.array(recall)))
        f.write(
            "Mean precision: {:.3f}: +- {:.3f}\n".format(
                np.mean(precision), np.std(precision)
            )
        )
        f.write("Weighted precision: {:.3f}\n".format(weighted_precision))
        f.write(
            "Registration Recall: {:.3f}: +- {:.3f}\n".format(
                mean_rr, np.std(np.array(recall))
            )
        )
        f.write(
            "Mean median RRE: {:.3f}: +- {:.3f}\n".format(
                np.mean(re_per_scene["median"]), np.std(re_per_scene["median"])
            )
        )
        f.write(
            "Mean median RTE: {:.3F}: +- {:.3f}\n".format(
                np.mean(te_per_scene["median"]), np.std(te_per_scene["median"])
            )
        )
    return mean_rr, c_flags, c_errors
