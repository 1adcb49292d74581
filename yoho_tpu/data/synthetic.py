"""Synthetic 3DMatch-style benchmark corpus generator.

Real 3DMatch blobs are stripped from this environment
(``/root/reference/.MISSING_LARGE_BLOBS``), so accuracy is proven on a
generated corpus that reproduces the *hard parts* of the real task
(VERDICT.md Missing #1): multi-fragment indoor scenes, partial overlap,
sensor-ish noise, arbitrary (NOT icosahedral-group) gt rotations, and
clutter, emitted in the exact reference on-disk layout
(``PointCloud/cloud_bin_k.ply`` + ``gt.log`` + ``gt.info``; reference
``utils/dataset.py:55-143``, ``others/Readme.md:30-34``) so the whole
pipeline — lifting, descriptors, matching, RANSAC, Redwood RR — runs
unchanged on it.

Scene model: a room (floor + 2-4 walls) populated with random clutter
primitives (boxes, spheres, cylinders at random poses/sizes), sampled
as surface points. A fragment is a partial view: points visible from a
random camera position by crude z-buffer occlusion over angular bins,
range-limited — mimicking a depth-camera fragment. Each test fragment
is stored in its own local frame with a random SE(3); ``gt.log`` holds
the aligning transform pairs with >=30% estimated overlap. Train scenes
are stored world-aligned with identity gt (the convention the trainset
miner expects, ``data/trainset.py`` stage 1; reference
``YOHO_Trainset.py:59-62``).

gt.info information matrices follow the Redwood convention consumed by
``compute_transformation_err`` (``benchmark/rr.py:43-51``, reference
``RR_cal.py:47-65``): for overlap points p (in the id1 fragment frame)
the 6-dof error x = [t, 2*q_imag] satisfies  err^2 ~ x^T Info x / n
with Info = sum_p G_p^T G_p,  G_p = [I_3 | d(R p)/d(2 q_imag)] =
[[1,0,0 |   0,  pz, -py],
 [0,1,0 | -pz,   0,  px],
 [0,0,1 |  py, -px,   0]]  (small-angle R ~ I + 2 [q_imag]_x).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from yoho_tpu.utils.ply import write_ply
from yoho_tpu.utils.so3 import random_rotation_matrix


# ---------------------------------------------------------------- primitives


def _sample_box(rng, center, size, density):
    """Surface-sample an axis-aligned box before posing."""
    sx, sy, sz = size
    areas = np.array([sy * sz, sy * sz, sx * sz, sx * sz, sx * sy, sx * sy])
    n = np.maximum((areas * density).astype(int), 8)
    pts = []
    for face, cnt in enumerate(n):
        u = rng.uniform(-0.5, 0.5, (cnt, 2))
        axis = face // 2
        sign = 1.0 if face % 2 == 0 else -1.0
        p = np.zeros((cnt, 3))
        other = [a for a in range(3) if a != axis]
        p[:, other[0]] = u[:, 0] * size[other[0]]
        p[:, other[1]] = u[:, 1] * size[other[1]]
        p[:, axis] = sign * size[axis] / 2
        pts.append(p)
    return np.concatenate(pts) + center


def _sample_sphere(rng, center, radius, density):
    n = max(int(4 * np.pi * radius**2 * density), 16)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return center + radius * v


def _sample_cylinder(rng, center, radius, height, density):
    n = max(int(2 * np.pi * radius * height * density), 16)
    theta = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-height / 2, height / 2, n)
    side = np.stack([radius * np.cos(theta), radius * np.sin(theta), z], axis=1)
    n_cap = max(int(np.pi * radius**2 * density), 8)
    r = radius * np.sqrt(rng.uniform(0, 1, (2 * n_cap,)))
    th = rng.uniform(0, 2 * np.pi, 2 * n_cap)
    zc = np.repeat([height / 2, -height / 2], n_cap)
    caps = np.stack([r * np.cos(th), r * np.sin(th), zc], axis=1)
    return center + np.concatenate([side, caps])


def make_room(rng, density: float = 4000.0) -> np.ndarray:
    """World-frame point cloud of one cluttered room (~3x3x2.5 m)."""
    W, D, H = rng.uniform(2.5, 4.0), rng.uniform(2.5, 4.0), rng.uniform(2.2, 2.8)
    pts = [
        _sample_box(rng, (0, 0, -0.005), (W, D, 0.01), density),  # floor
        _sample_box(rng, (0, D / 2, H / 2), (W, 0.01, H), density),  # back wall
        _sample_box(rng, (-W / 2, 0, H / 2), (0.01, D, H), density),  # left wall
    ]
    if rng.uniform() < 0.5:
        pts.append(_sample_box(rng, (W / 2, 0, H / 2), (0.01, D, H), density))
    n_obj = rng.integers(6, 14)
    for _ in range(n_obj):
        kind = rng.integers(0, 3)
        c = np.array(
            [
                rng.uniform(-W / 2 + 0.3, W / 2 - 0.3),
                rng.uniform(-D / 2 + 0.3, D / 2 - 0.3),
                0.0,
            ]
        )
        if kind == 0:
            size = rng.uniform(0.15, 0.9, 3)
            c[2] = size[2] / 2
            p = _sample_box(rng, (0, 0, 0), size, density)
            Rz = random_rotation_matrix(rng)
            # keep clutter upright-ish: rotate about z only
            a = rng.uniform(0, 2 * np.pi)
            Rz = np.array(
                [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
            )
            p = p @ Rz.T + c
        elif kind == 1:
            r = rng.uniform(0.1, 0.4)
            c[2] = rng.uniform(r, 1.2)
            p = _sample_sphere(rng, c, r, density)
        else:
            r, h = rng.uniform(0.08, 0.3), rng.uniform(0.3, 1.2)
            c[2] = h / 2
            p = _sample_cylinder(rng, c, r, h, density)
        pts.append(p)
    return np.concatenate(pts).astype(np.float32)


# ---------------------------------------------------------------- fragments


def render_fragment(
    rng,
    world: np.ndarray,
    cam: np.ndarray,
    look: np.ndarray,
    fov_deg: float = 55.0,
    max_range: float = 4.5,
    n_az: int = 220,
    n_el: int = 170,
    noise: float = 0.004,
    dropout: float = 0.10,
) -> np.ndarray:
    """Crude depth-camera view: angular-bin z-buffer occlusion.

    Points are binned by (azimuth, elevation) around the view axis;
    within each bin only points within 6 cm of the nearest survive
    (surfaces are kept, back geometry occluded). Gaussian range noise
    and random dropout mimic sensor artifacts.
    """
    d = world - cam[None, :]
    rng_d = np.linalg.norm(d, axis=1)
    fwd = look - cam
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    if abs(fwd @ up) > 0.99:  # near-vertical view axis: pick another up
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    x = d @ right
    y = d @ up2
    z = d @ fwd
    keep = (z > 0.25) & (rng_d < max_range)
    half = np.tan(np.radians(fov_deg / 2))
    u = x / np.maximum(z, 1e-6)
    v = y / np.maximum(z, 1e-6)
    keep &= (np.abs(u) < half) & (np.abs(v) < half)
    idx = np.where(keep)[0]
    if idx.size == 0:
        return np.zeros((0, 3), np.float32)
    ub = ((u[idx] + half) / (2 * half) * n_az).astype(np.int32)
    vb = ((v[idx] + half) / (2 * half) * n_el).astype(np.int32)
    binid = ub * n_el + vb
    order = np.lexsort((rng_d[idx], binid))
    bs, rs = binid[order], rng_d[idx][order]
    first = np.concatenate([[True], bs[1:] != bs[:-1]])
    # nearest range per bin (rows sorted by (bin, range): first-of-bin is
    # the bin minimum), forward-filled to the bin's members
    seg_near = rs[first][np.cumsum(first) - 1]
    vis = rs < seg_near + 0.06
    sel = idx[order][vis]
    pts = world[sel]
    # range noise along the ray
    ray = pts - cam[None, :]
    ray /= np.linalg.norm(ray, axis=1, keepdims=True) + 1e-12
    pts = pts + ray * rng.normal(scale=noise, size=(len(pts), 1))
    m = rng.uniform(size=len(pts)) > dropout
    return pts[m].astype(np.float32)


def _overlap_ratio(p0: np.ndarray, p1: np.ndarray, voxel: float = 0.05) -> float:
    """Fraction of p0's voxels also occupied by p1 (both world-frame)."""
    v0 = {tuple(v) for v in np.unique(np.floor(p0 / voxel).astype(np.int64), axis=0)}
    v1 = {tuple(v) for v in np.unique(np.floor(p1 / voxel).astype(np.int64), axis=0)}
    if not v0 or not v1:
        return 0.0
    inter = len(v0 & v1)
    return inter / min(len(v0), len(v1))


# ---------------------------------------------------------------- emission


def _write_gt_files(
    gt_dir: str,
    pairs: List[Tuple[int, int]],
    transforms: List[np.ndarray],
    overlaps_world: List[np.ndarray],
    n_frag: int,
) -> None:
    with open(os.path.join(gt_dir, "gt.log"), "w") as w:
        for (i, j), T in zip(pairs, transforms):
            w.write(f"{i}\t{j}\t{n_frag}\t\n")
            for r in range(4):
                w.write("\t".join(f"{T[r, c]:.8f}" for c in range(4)) + "\t\n")
    with open(os.path.join(gt_dir, "gt.info"), "w") as w:
        for (i, j), pts in zip(pairs, overlaps_world):
            info = np.zeros((6, 6))
            if len(pts):
                px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
                zeros = np.zeros_like(px)
                ones = np.ones_like(px)
                G = np.stack(
                    [
                        np.stack([ones, zeros, zeros, zeros, pz, -py], 1),
                        np.stack([zeros, ones, zeros, -pz, zeros, px], 1),
                        np.stack([zeros, zeros, ones, py, -px, zeros], 1),
                    ],
                    axis=1,
                )  # (n, 3, 6)
                info = np.einsum("nij,nik->jk", G, G)
            w.write(f"{i}\t{j}\t{n_frag}\t\n")
            for r in range(6):
                w.write("\t".join(f"{info[r, c]:.6f}" for c in range(6)) + "\t\n")


def generate_scene(
    out_root: str,
    scene_name: str,
    n_frag: int,
    seed: int,
    aligned: bool = False,
    density: float = 4000.0,
    min_overlap: float = 0.30,
) -> int:
    """Generate one scene; returns the number of gt pairs written.

    Test scenes (``aligned=False``): fragment k is stored in a random
    local frame; gt.log rows carry T s.t. (R @ pts_j + t) lands in
    fragment i's frame (reference convention ``utils/dataset.py:40-44``).
    Train scenes (``aligned=True``): all fragments stored world-aligned,
    gt transforms = identity.
    """
    rng = np.random.default_rng(seed)
    scene_dir = os.path.join(out_root, scene_name)
    pc_dir = os.path.join(scene_dir, "PointCloud")
    # The .done sentinel records the generation parameters, not just the
    # pair count: a bare exists-check silently no-ops when the corpus is
    # rescaled (e.g. train_frags 6 -> 8) on a machine holding an older
    # corpus, and the ladder then trains on mixed-parameter scenes.
    # Param mismatch (or a legacy bare-int sentinel) regenerates the
    # scene from scratch; generation is deterministic in ``seed``, so
    # same-param regeneration reproduces identical files.
    params = {
        "n_frag": int(n_frag),
        "seed": int(seed),
        "aligned": bool(aligned),
        "density": float(density),
        "min_overlap": float(min_overlap),
    }
    done_fn = os.path.join(scene_dir, ".done")
    if os.path.exists(done_fn):
        import json

        try:
            with open(done_fn) as f:
                rec = json.load(f)
            if isinstance(rec, dict) and rec.get("params") == params:
                return int(rec["pairs"])
        except (ValueError, KeyError):
            pass  # legacy bare-int sentinel: params unknown -> regenerate
        import shutil

        shutil.rmtree(scene_dir)
    os.makedirs(pc_dir, exist_ok=True)

    world = make_room(rng, density)
    lo, hi = world.min(0), world.max(0)
    center = (lo + hi) / 2

    # camera trajectory: an arc through the room interior
    frags_world: List[np.ndarray] = []
    attempts = 0
    while len(frags_world) < n_frag and attempts < n_frag * 8:
        attempts += 1
        k = len(frags_world)
        ang = 2 * np.pi * (k / max(n_frag, 1)) + rng.normal(scale=0.25)
        cam = center + np.array(
            [
                0.35 * (hi[0] - lo[0]) * np.cos(ang),
                0.35 * (hi[1] - lo[1]) * np.sin(ang),
                rng.uniform(0.9, 1.7) - center[2],
            ]
        )
        look = center + rng.normal(scale=0.5, size=3)
        look[2] = rng.uniform(0.3, 1.2)
        f = render_fragment(rng, world, cam, look)
        if len(f) < 8000:
            continue
        frags_world.append(f)
    n_frag = len(frags_world)

    # local frames
    poses = []  # T_k: local -> world  (p_world = R_k @ p_local + t_k)
    for k in range(n_frag):
        if aligned:
            R, t = np.eye(3), np.zeros(3)
        else:
            R = random_rotation_matrix(rng)
            t = rng.normal(scale=1.5, size=3)
        poses.append((R, t))
        local = (frags_world[k] - t[None, :]) @ R  # R^T (p - t)
        write_ply(os.path.join(pc_dir, f"cloud_bin_{k}.ply"), local.astype(np.float32))

    pairs, transforms, overlaps = [], [], []
    for i in range(n_frag):
        for j in range(i + 1, n_frag):
            ov = _overlap_ratio(frags_world[i], frags_world[j])
            if ov < min_overlap:
                continue
            Ri, ti = poses[i]
            Rj, tj = poses[j]
            # p_i = Ri^T (Rj p_j + tj - ti): local_j -> local_i
            R = Ri.T @ Rj
            t = Ri.T @ (tj - ti)
            T = np.eye(4)
            T[:3, :3], T[:3, 3] = R, t
            pairs.append((i, j))
            transforms.append(T)
            # overlap points in fragment-j local frame (for gt.info):
            # subsample j's points that land near i's voxels
            pj_world = frags_world[j]
            sel = rng.choice(len(pj_world), min(len(pj_world), 3000), replace=False)
            vox_i = {
                tuple(v)
                for v in np.unique(
                    np.floor(frags_world[i] / 0.05).astype(np.int64), axis=0
                )
            }
            pw = pj_world[sel]
            m = np.array(
                [tuple(v) in vox_i for v in np.floor(pw / 0.05).astype(np.int64)]
            )
            pj_local = (pw[m] - tj[None, :]) @ Rj
            overlaps.append(pj_local)
    _write_gt_files(pc_dir, pairs, transforms, overlaps, n_frag)
    import json

    with open(done_fn, "w") as f:
        json.dump({"pairs": len(pairs), "params": params}, f)
    return len(pairs)


def generate_corpus(
    root: str,
    test_scenes: int = 2,
    test_frags: int = 8,
    train_scenes: int = 48,
    train_frags: int = 8,
    seed: int = 0,
) -> Dict[str, Dict[str, int]]:
    """Emit synth_test/* (local frames) and synth_train/* (aligned).

    Train-split size is the measured accuracy bottleneck: FCGF overfits
    small corpora within ~2k steps (RESULTS.md). The default is 48
    scenes x 8 fragments — the corpus the committed round-5 release was
    actually trained on (round 4 had grown it out-of-band, which made a
    fresh clone regenerate only 16 scenes and silently train on a third
    of the data). Scene generation is seed-deterministic, so bumping the
    default on an existing 16-scene tree adds scenes 16-47 bit-identically.
    Test split stays fixed for round-over-round eval comparability."""
    out = {"synth_test": {}, "synth_train": {}}
    for s in range(test_scenes):
        name = f"scene_{s:02d}"
        n = generate_scene(
            os.path.join(root, "synth_test"), name, test_frags, seed=1000 + s
        )
        out["synth_test"][name] = n
    for s in range(train_scenes):
        name = f"scene_{s:02d}"
        n = generate_scene(
            os.path.join(root, "synth_train"),
            name,
            train_frags,
            seed=2000 + s,
            aligned=True,
        )
        out["synth_train"][name] = n
    return out


def register_synthetic_tables(root: str) -> None:
    """Add synth_test/synth_train to the dataset registry by scanning
    what ``generate_corpus`` emitted (fragment counts from .ply files)."""
    from yoho_tpu.data.dataset import SCENE_TABLES

    for split in ("synth_test", "synth_train"):
        base = os.path.join(root, split)
        if not os.path.isdir(base):
            continue
        scenes = sorted(
            d for d in os.listdir(base) if os.path.isdir(os.path.join(base, d))
        )
        counts = []
        for sc in scenes:
            pc = os.path.join(base, sc, "PointCloud")
            counts.append(
                len([f for f in os.listdir(pc) if f.endswith(".ply")])
            )
        SCENE_TABLES[split] = (scenes, counts)
