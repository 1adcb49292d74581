"""Training-set generation (reference ``/root/reference/YOHO_Trainset.py``).

Stages, each idempotent via on-disk caching like the reference:

1. keypoint PCA filtering + ground-truth pair mining
   (``PCA_keys_sample``, ``YOHO_Trainset.py:32-62``). The reference
   loads precomputed ``pca_0.3/*.npy`` files (produced outside the
   repo); here local PCA over a 0.3 m radius is computed in-tree and
   the filter keeps keypoints with surface variation
   lambda_min / (lambda1+lambda2+lambda3) > 0.03 — geometrically
   salient, non-planar points, matching the reference's intent.
   Train fragments are stored aligned in a per-scene world frame, so
   gt point pairs are mined by direct distance < 0.02 m
   (``YOHO_Trainset.py:59-62`` — no transform applied).
2. 5-random-rotation x 60-group FCGF feature extraction per cloud
   (``PC_random_rot_feat``, ``:112-137``) -> ``{pc}_feats.npz`` with
   (5, kn, 60, 32) features + (5, 3, 3) rotations (our group-first
   layout).
3. batch baking (``trainset``, ``:158-248``): 10 batches of 32
   keypoint pairs per fragment pair; labels R = R_j @ R_gt^T @ R_i^T,
   true_idx = nearest group element, delta_q = quat(R @ R_anchor^T).
4. validation list (``valset``, ``:252-297``): 5,000 (pair, point,
   Ri, Rj) tuples.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List

import numpy as np

from yoho_tpu.group import get_group
from yoho_tpu.group.icosahedral import nearest_group_index
from yoho_tpu.utils.so3 import quaternion_from_matrix, random_rotation_matrix


def _ensure(d):
    os.makedirs(d, exist_ok=True)
    return d


def local_pca_sigma(points: np.ndarray, keys: np.ndarray, radius: float = 0.3) -> np.ndarray:
    """Surface variation per keypoint: lambda_min / trace of the local
    covariance within ``radius``."""
    try:
        from scipy.spatial import cKDTree

        tree = cKDTree(points)
        out = np.zeros(len(keys))
        for i, k in enumerate(keys):
            idx = tree.query_ball_point(k, radius)
            if len(idx) < 8:
                out[i] = 0.0
                continue
            nb = points[idx] - points[idx].mean(0)
            w = np.linalg.eigvalsh(nb.T @ nb / len(idx))
            out[i] = w[0] / max(w.sum(), 1e-12)
        return out
    except ImportError:  # chunked brute force fallback
        out = np.zeros(len(keys))
        for i, k in enumerate(keys):
            d = np.linalg.norm(points - k[None], axis=1)
            nb = points[d < radius]
            if len(nb) < 8:
                continue
            nb = nb - nb.mean(0)
            w = np.linalg.eigvalsh(nb.T @ nb / len(nb))
            out[i] = w[0] / max(w.sum(), 1e-12)
        return out


def filter_keypoints_and_pairs(
    datasets: Dict, output_dir: str, val_scenes: List[str], sigma_thresh: float = 0.03,
    pair_dist: float = 0.02,
) -> None:
    """Stage 1 (reference PCA_keys_sample)."""
    for name, dataset in datasets.items():
        if name in ("wholesetname", "valscenes"):
            continue
        keys_dir = _ensure(os.path.join(output_dir, "Filtered_Keys", dataset.name))
        pair_dir = _ensure(os.path.join(output_dir, "Pairs_0.03", dataset.name))
        for pc_id in dataset.pc_ids:
            idx_fn = os.path.join(keys_dir, f"{pc_id}_index.npy")
            if os.path.exists(idx_fn):
                continue
            pc = dataset.get_pc(pc_id)
            keys = dataset.get_kps(pc_id)
            key_idx_fn = os.path.join(
                dataset.root, "Keypoints", f"cloud_bin_{int(pc_id)}Keypoints.txt"
            )
            key_index = np.loadtxt(key_idx_fn).astype(np.int64)
            from yoho_tpu import native

            sigma = native.pca_sigma(pc, keys)
            ok = sigma > sigma_thresh
            np.save(os.path.join(keys_dir, f"{pc_id}_coor.npy"), keys[ok])
            np.save(idx_fn, key_index[ok])
        for pc0, pc1 in dataset.pair_ids:
            fn = os.path.join(pair_dir, f"{pc0}-{pc1}.npy")
            if os.path.exists(fn):
                continue
            k0 = np.load(os.path.join(keys_dir, f"{pc0}_coor.npy"))
            k1 = np.load(os.path.join(keys_dir, f"{pc1}_coor.npy"))
            if len(k0) == 0 or len(k1) == 0:
                np.save(fn, np.zeros((0, 2), np.int64))
                continue
            from yoho_tpu import native

            np.save(fn, native.radius_pairs(k0, k1, pair_dist))


def generate_rotated_features(
    lift_fn, datasets: Dict, output_dir: str, pad: int, n_rot: int = 5, seed: int = 0
) -> None:
    """Stage 2: per cloud, ``n_rot`` random rotations x 60-group lift.

    ``lift_fn(points, keys) -> (array, kn_actual)`` is the caller's
    (jitted) device lift. The returned array may be an UNMATERIALIZED
    device array (JAX dispatch is async): this loop runs a 1-cloud-deep
    pipeline — all of cloud i's rotations are enqueued, then cloud i-1's
    results are pulled to host and saved while the device works on i.
    Round-4 measurement: the serial version spent ~17 of ~26 s/cloud in
    untransposed host I/O through the device tunnel (docs/PERF.md).

    Features are stored float16 (descriptors are L2-normalized 32-d;
    f16's 11-bit mantissa is far above their noise floor) — halving both
    the device->host transfer (the caller casts on device) and the
    on-disk cache. Consumers cast back at load (``bake_*_batches``).
    """
    rng = np.random.default_rng(seed)
    pending = []  # [(fn, Rs, [device_arrays], [kn])] — depth-1 pipeline

    def flush(n_keep: int) -> None:
        while len(pending) > n_keep:
            out_fn, out_Rs, devs, kns = pending.pop(0)
            feats = np.stack(
                [np.asarray(d)[:kn].astype(np.float16) for d, kn in zip(devs, kns)]
            ) if len(set(kns)) == 1 else None
            if feats is None:  # ragged kn (never in practice): save padded
                feats = np.stack([np.asarray(d).astype(np.float16) for d in devs])
            np.savez(out_fn, Rs=out_Rs, feats=feats)

    for name, dataset in datasets.items():
        if name in ("wholesetname", "valscenes"):
            continue
        feat_dir = _ensure(os.path.join(output_dir, "Rotated_Features", dataset.name))
        keys_dir = os.path.join(output_dir, "Filtered_Keys", dataset.name)
        for pc_id in dataset.pc_ids:
            fn = os.path.join(feat_dir, f"{pc_id}_feats.npz")
            if os.path.exists(fn):
                continue
            pc = dataset.get_pc(pc_id).astype(np.float32)
            key_index = np.load(os.path.join(keys_dir, f"{pc_id}_index.npy"))
            Rs = np.stack([random_rotation_matrix(rng) for _ in range(n_rot)]).astype(
                np.float32
            )
            devs, kns = [], []
            for r in range(n_rot):
                pc_r = pc @ Rs[r].T
                keys_r = pc_r[key_index]
                d, kn = lift_fn(pc_r, keys_r)
                devs.append(d)
                kns.append(kn)
            pending.append((fn, Rs, devs, kns))
            flush(1)
    flush(0)


def bake_train_batches(
    datasets: Dict,
    output_dir: str,
    val_scenes: List[str],
    batch_size: int = 32,
    batches_per_pair: int = 10,
    seed: int = 0,
) -> int:
    """Stage 3: write ``Train_val_list/trainset/{i}.npz`` batches."""
    G = get_group()
    rng = np.random.default_rng(seed)
    save_dir = _ensure(os.path.join(output_dir, "Train_val_list", "trainset"))
    batch_i = -1
    trainlist = []
    for name, dataset in datasets.items():
        if name in ("wholesetname", "valscenes") or name in val_scenes:
            continue
        feat_dir = os.path.join(output_dir, "Rotated_Features", dataset.name)
        pair_dir = os.path.join(output_dir, "Pairs_0.03", dataset.name)
        for pc0, pc1 in dataset.pair_ids:
            f0 = np.load(os.path.join(feat_dir, f"{pc0}_feats.npz"))
            f1 = np.load(os.path.join(feat_dir, f"{pc1}_feats.npz"))
            feats0, Rs0 = f0["feats"], f0["Rs"]
            feats1, Rs1 = f1["feats"], f1["Rs"]
            n_rot = Rs0.shape[0]
            R_gt = dataset.get_transform(pc0, pc1)[:3, :3]
            # label tables over all (Ri, Rj) combos (YOHO_Trainset.py:182-194)
            allR = np.zeros((n_rot, n_rot, 3, 3))
            allIdx = np.zeros((n_rot, n_rot), np.int64)
            allDq = np.zeros((n_rot, n_rot, 4))
            for i in range(n_rot):
                for j in range(n_rot):
                    R = Rs1[j] @ R_gt.T @ Rs0[i].T  # from pc0 to pc1
                    gi = nearest_group_index(R, G.rotations)
                    allR[i, j] = R
                    allIdx[i, j] = gi
                    allDq[i, j] = quaternion_from_matrix(R @ G.rotations[gi].T)
            pps = np.load(os.path.join(pair_dir, f"{pc0}-{pc1}.npy"))
            if pps.shape[0] < 10:
                continue
            idx_all = np.arange(pps.shape[0])
            if idx_all.shape[0] < batch_size:
                idx_all = np.repeat(idx_all, batch_size // idx_all.shape[0] + 1)
            for b in range(batches_per_pair):
                rng.shuffle(idx_all)
                sel = pps[idx_all[:batch_size]]
                ii = rng.integers(0, n_rot, batch_size)
                jj = rng.integers(0, n_rot, batch_size)
                item = {
                    "feats0": feats0[ii, sel[:, 0]].astype(np.float32),  # (B,60,32)
                    "feats1": feats1[jj, sel[:, 1]].astype(np.float32),
                    "R": allR[ii, jj].astype(np.float32),
                    "true_idx": allIdx[ii, jj].astype(np.int32),
                    "delta_q": allDq[ii, jj].astype(np.float32),
                }
                batch_i += 1
                np.savez(os.path.join(save_dir, f"{batch_i}.npz"), **item)
                trainlist.append((dataset.name, pc0, pc1, b))
    with open(os.path.join(output_dir, "Train_val_list", "train.pkl"), "wb") as f:
        pickle.dump(list(range(batch_i + 1)), f)
    with open(os.path.join(output_dir, "Train_val_list", "train_pcp.pkl"), "wb") as f:
        pickle.dump(trainlist, f)
    return batch_i + 1


def bake_val_batches(
    datasets: Dict,
    output_dir: str,
    val_scenes: List[str],
    batch_size: int = 32,
    max_items: int = 5000,
    seed: int = 1,
) -> int:
    """Stage 4: validation batches from held-out scenes."""
    G = get_group()
    rng = np.random.default_rng(seed)
    save_dir = _ensure(os.path.join(output_dir, "Train_val_list", "valset"))
    items = []
    for scene in val_scenes:
        if scene not in datasets:
            continue
        dataset = datasets[scene]
        feat_dir = os.path.join(output_dir, "Rotated_Features", dataset.name)
        pair_dir = os.path.join(output_dir, "Pairs_0.03", dataset.name)
        for pc0, pc1 in dataset.pair_ids:
            pps = np.load(os.path.join(pair_dir, f"{pc0}-{pc1}.npy"))
            for k in range(pps.shape[0]):
                items.append((dataset.name, pc0, pc1, pps[k, 0], pps[k, 1]))
    rng.shuffle(items)
    items = items[:max_items]
    n_batches = len(items) // batch_size
    bi = 0
    for b in range(n_batches):
        chunk = items[b * batch_size : (b + 1) * batch_size]
        feats0, feats1, true_idx, delta_q = [], [], [], []
        for name, pc0, pc1, p0, p1 in chunk:
            f0 = np.load(os.path.join(output_dir, "Rotated_Features", name, f"{pc0}_feats.npz"))
            f1 = np.load(os.path.join(output_dir, "Rotated_Features", name, f"{pc1}_feats.npz"))
            scene = name.split("/")[-1]
            R_gt = datasets[scene].get_transform(pc0, pc1)[:3, :3]
            i = rng.integers(0, f0["Rs"].shape[0])
            j = rng.integers(0, f1["Rs"].shape[0])
            R = f1["Rs"][j] @ R_gt.T @ f0["Rs"][i].T
            gi = nearest_group_index(R, G.rotations)
            feats0.append(f0["feats"][i, p0])
            feats1.append(f1["feats"][j, p1])
            true_idx.append(gi)
            delta_q.append(quaternion_from_matrix(R @ G.rotations[gi].T))
        np.savez(
            os.path.join(save_dir, f"{bi}.npz"),
            feats0=np.stack(feats0).astype(np.float32),
            feats1=np.stack(feats1).astype(np.float32),
            true_idx=np.asarray(true_idx, np.int32),
            delta_q=np.stack(delta_q).astype(np.float32),
        )
        bi += 1
    with open(os.path.join(output_dir, "Train_val_list", "val.pkl"), "wb") as f:
        pickle.dump(list(range(bi)), f)
    return bi


def augment_group_batch(batch: dict, rng, group=None) -> dict:
    """Free on-the-fly group augmentation of one baked PartI/PartII batch.

    Composing a random icosahedral element onto each side of a baked
    sample multiplies the effective rotation labels x3600 without any
    re-lifting, because the group-feature tensors transform by pure
    permutation (the equivariance the descriptor nets are built on).
    With ``cayley[a, b] = index(R[b] @ R[a])`` (``group/icosahedral.py``)
    and per-sample group elements a (cloud 0) and b (cloud 1):

      feats0'[g] = feats0[cayley[a, g]]        (F'[g] = F(R_g R_a x))
      feats1'[g] = feats1[cayley[b, g]]
      R'         = R_b @ R @ R_a^T             (label R maps frame0 -> frame1)
      true_idx'  = cayley[cayley[inverse[a], gi], b]
      delta_q'   = (w, R_b v)                  (conjugation by R_b keeps the
                                                residual angle, rotates its axis;
                                                composing a alone leaves it fixed)

    The relabeling is exact (group closure), not a re-quantization: if
    R = D @ R[gi] with residual D inside the nearest-neighbor basin,
    then R' = (R_b D R_b^T) @ R[gi'] with the same residual angle.
    Fixes the measured PartI 60-way-head overfit (round-3 RESULTS.md:
    val CE 6.2 vs 4.1 at chance with no augmentation; reference analog:
    none — YOHO_Trainset.py bakes labels once).
    """
    G = group or get_group()
    cay = G.cayley
    inv = G.inverse
    B = batch["true_idx"].shape[0]
    a = rng.integers(0, G.order, B)
    b = rng.integers(0, G.order, B)
    rows = np.arange(B)[:, None]
    out = dict(batch)
    out["feats0"] = batch["feats0"][rows, cay[a, :]]
    out["feats1"] = batch["feats1"][rows, cay[b, :]]
    out["true_idx"] = cay[cay[inv[a], batch["true_idx"]], b].astype(np.int32)
    q = batch["delta_q"]
    v = np.einsum("bij,bj->bi", G.rotations[b], q[:, 1:])
    out["delta_q"] = np.concatenate([q[:, :1], v], axis=1).astype(np.float32)
    if "R" in batch:
        out["R"] = np.einsum(
            "bij,bjk,blk->bil", G.rotations[b], batch["R"], G.rotations[a]
        ).astype(np.float32)
    return out


def batch_iterator(dir_path: str, shuffle: bool = True, seed: int = 0):
    """Yield baked .npz batches as dicts of arrays."""
    files = sorted(
        (f for f in os.listdir(dir_path) if f.endswith(".npz")),
        key=lambda s: int(s[:-4]),
    )
    order = np.arange(len(files))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for i in order:
        with np.load(os.path.join(dir_path, files[i])) as z:
            yield {k: z[k] for k in z.files}
