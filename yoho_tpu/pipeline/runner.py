"""Host-side pipeline orchestration with idempotent stage caching.

The reference's L5 layer (``tests/extractor.py``, ``tests/matcher.py``,
``tests/estimator.py``, ``tests/evaluator.py``) communicates through an
on-disk cache and skips finished stages via ``os.path.exists`` — its
only failure-recovery mechanism (SURVEY.md intro). This runner keeps
that contract (same cache layout, same ``pre.log`` outputs, so the RR
benchmark is file-compatible) while replacing every compute stage with
the jitted TPU pipeline:

  FCGF group lifting     -> pipeline/lifting.py      (one jit program)
  PartI descriptors      -> models/part1.py
  mutual matcher         -> pipeline/matching.py
  DR-index               -> models/part1.des2dr
  PartII per-match poses -> models/part2.py
  YOHO-C / YOHO-O RANSAC -> pipeline/ransac.py       (vmapped on device)

Cache layout (mirrors the reference under a different root name):
  {cache}/Testset/{dataset.name}/FCGF_Input_Group_feature/{pc}.npy  (Kn,60,32)
  {cache}/Testset/{dataset.name}/YOHO_Output_Group_feature/{pc}.npy (Kn,60,32)
  {cache}/Testset/{dataset.name}/Match/{id0}-{id1}.npy
  {cache}/Testset/{dataset.name}/Match/DR_index/{id0}-{id1}.npy
  {cache}/Testset/{dataset.name}/Match/Trans_pre/{id0}-{id1}.npy
  {cache}/Testset/{dataset.name}/Match/{SIGN}/{iters}iters/{id0}-{id1}.npz + pre.log

Note: group tensors are stored (Kn, 60, C) — the group-axis-first
layout of this framework — not the reference's (Kn, C, 60).
"""

from __future__ import annotations

import os
import time
from typing import Dict

import numpy as np

from yoho_tpu.benchmark import rr
from yoho_tpu.config import PipelineConfig
from yoho_tpu.utils.so3 import transform_points


def _ensure(d):
    os.makedirs(d, exist_ok=True)
    return d


def host_prevoxelize(
    points: np.ndarray,
    voxel_size: float,
    max_points: int,
    return_dropped: bool = False,
):
    """One representative raw point per voxel (first occurrence), then
    truncate to max_points. The reference voxelizes the raw cloud per
    rotation (YOHO_testset.py:40); pre-voxelizing the unrotated cloud
    once and re-voxelizing its representatives per rotation yields the
    same voxel occupancy up to boundary ties and keeps device pads
    static. Uses the native C++ hash voxelizer when available.

    ``return_dropped=True`` additionally returns the number of voxels
    truncated by the ``max_points`` cap (the saturation counter callers
    surface via StageTimer; 0 in the normal case)."""
    from yoho_tpu import native

    first = native.prevoxelize_indices(np.asarray(points, np.float32), voxel_size)
    reps = points[np.sort(first)]
    # Cap at max_points-1: a grid of size m holds at most m-1 voxels
    # (row m-1 is the reserved zero row, ops/voxel.py), so a cloud that
    # exactly fills the largest bucket would silently drop one voxel.
    cap = max_points - 1
    dropped = max(0, reps.shape[0] - cap)
    if dropped:
        sel = np.random.default_rng(0).choice(reps.shape[0], cap, replace=False)
        reps = reps[np.sort(sel)]
    reps = reps.astype(np.float32)
    return (reps, dropped) if return_dropped else reps


class PipelineRunner:
    """Owns the jitted stage functions + model variables."""

    def __init__(self, cfg: PipelineConfig, fcgf_vars, part1_vars, part2_vars=None):
        import jax
        import jax.numpy as jnp

        from yoho_tpu.models.fcgf import SparseResUNet
        from yoho_tpu.models.part1 import PartINetwork, des2dr
        from yoho_tpu.models.part2 import PartIINetwork
        from yoho_tpu.pipeline.lifting import lift_group_features
        from yoho_tpu.pipeline.matching import mutual_match
        from yoho_tpu.pipeline.ransac import yoho_c_ransac, yoho_o_ransac
        from yoho_tpu.utils.so3 import jax_matrix_from_quaternion

        self.cfg = cfg
        self.jnp = jnp
        self.jax = jax
        fcgf = SparseResUNet(cfg.backbone)
        part1 = PartINetwork(cfg.part1)
        part2 = PartIINetwork(cfg.part2)
        self._part2_vars = part2_vars
        pad = cfg.pad.max_voxels
        kn = cfg.pad.num_keypoints

        fcgf_apply = lambda v, f, p: fcgf.apply(v, f, p, False)

        lift_cache = {}

        def lift_for_bucket(bucket: int):
            """One jitted lift per voxel bucket (points padded to the
            bucket, so every sort/gather scales with actual cloud size)."""
            if bucket not in lift_cache:

                @jax.jit
                def lift(points, n_valid, keys):
                    return lift_group_features(
                        fcgf_apply,
                        fcgf_vars,
                        points,
                        n_valid,
                        keys,
                        cfg.backbone.voxel_size,
                        cfg.backbone.conv1_kernel_size,
                        rotations_per_batch=6,
                    )

                lift_cache[bucket] = lift
            return lift_cache[bucket]

        @jax.jit
        def part1_desc(F):
            out = part1.apply(part1_vars, F, False)
            return out["eqv"], out["inv"]

        @jax.jit
        def match_and_dr(eqv0, inv0, eqv1, inv1):
            m = mutual_match(inv0, inv1)
            # reference arg order: Batch_Des2R_torch(feats1, feats0)
            # (tests/extractor.py:99) — before-rot first.
            dr = des2dr(eqv1[m.pairs[:, 1]], eqv0[m.pairs[:, 0]])
            return m, dr

        @jax.jit
        def ransac_c(key, keys0, keys1, pairs, mask, dr):
            return yoho_c_ransac(
                key, keys0, keys1, pairs, mask, dr,
                max_iter=cfg.ransac.max_iter,
                inlier_dist=cfg.ransac.inlier_dist_c,
                refine_iters=cfg.ransac.refine_iters,
            )

        @jax.jit
        def part2_poses(bf0, bf1, af0, af1, pre_idx, keys_m0, keys_m1):
            """Per-match transforms (reference extractor_PartII,
            tests/extractor.py:125-201, incl. the 0<->1 swap)."""
            q = part2.apply(
                self._part2_vars, bf1, bf0, af1, af0, pre_idx, False
            )  # swapped: '0' slot = after-rot side = our cloud... see batch_create
            R_res = jax_matrix_from_quaternion(q)  # (M, 3, 3)
            Rg = jnp.asarray(self._Rgroup)
            R = jnp.einsum("mij,mjk->mik", R_res, Rg[pre_idx])
            t = keys_m0 - jnp.einsum("mij,mj->mi", R, keys_m1)
            return jnp.concatenate([R, t[:, :, None]], axis=2)  # (M, 3, 4)

        @jax.jit
        def ransac_o(keys0, keys1, pairs, mask, transforms):
            return yoho_o_ransac(
                keys0, keys1, pairs, mask, transforms,
                inlier_dist=cfg.ransac.inlier_dist_o,
                refine_iters=cfg.ransac.refine_iters,
                refine_topk=cfg.ransac.refine_topk,
            )

        # Batched estimators: all of a scene's pairs as vmap lanes of ONE
        # dispatch (the reference forks a process per pair instead,
        # ``yohoc_mul``, estimator.py:269-273). Chunked by the caller to
        # bound the (T, M) scoring buffers.
        @jax.jit
        def ransac_c_batch(keys, keys0, keys1, pairs, mask, dr):
            return jax.vmap(
                lambda k, a, b, p, mm, d: yoho_c_ransac(
                    k, a, b, p, mm, d,
                    max_iter=cfg.ransac.max_iter,
                    inlier_dist=cfg.ransac.inlier_dist_c,
                    refine_iters=cfg.ransac.refine_iters,
                )
            )(keys, keys0, keys1, pairs, mask, dr)

        @jax.jit
        def ransac_o_batch(keys0, keys1, pairs, mask, transforms):
            return jax.vmap(
                lambda a, b, p, mm, t: yoho_o_ransac(
                    a, b, p, mm, t, inlier_dist=cfg.ransac.inlier_dist_o,
                    refine_iters=cfg.ransac.refine_iters,
                    refine_topk=cfg.ransac.refine_topk,
                )
            )(keys0, keys1, pairs, mask, transforms)

        from yoho_tpu.group import get_group

        # Multi-device: shard the lift (clouds over `data`, the
        # 60-rotation axis over `group`) — the production wiring of
        # parallel/sharded.py. Single device keeps the per-cloud jit.
        n_dev = jax.device_count()
        self.use_sharded_lift = n_dev > 1
        if self.use_sharded_lift:
            from yoho_tpu.parallel.mesh import make_mesh
            from yoho_tpu.parallel.sharded import make_sharded_lift

            n_group = max(
                g for g in range(1, n_dev + 1) if n_dev % g == 0 and 60 % g == 0
            )
            self.lift_mesh = make_mesh(n_dev // n_group, n_group)
            sharded_cache = {}

            def sharded_lift_for_bucket(bucket: int):
                if bucket not in sharded_cache:
                    sharded_cache[bucket] = make_sharded_lift(
                        self.lift_mesh,
                        fcgf_apply,
                        cfg.backbone.voxel_size,
                        cfg.backbone.conv1_kernel_size,
                    )
                return sharded_cache[bucket]

            self.sharded_lift_for_bucket = sharded_lift_for_bucket

        from yoho_tpu.utils.observability import StageTimer

        self.timer = StageTimer()
        self._Rgroup = get_group().rotations.astype(np.float32)
        self._fcgf_vars = fcgf_vars
        self.lift_for_bucket = lift_for_bucket
        self.part1_desc = part1_desc
        self.match_and_dr = match_and_dr
        self.ransac_c = ransac_c
        self.part2_poses = part2_poses
        self.ransac_o = ransac_o
        self.ransac_c_batch = ransac_c_batch
        self.ransac_o_batch = ransac_o_batch
        self.pad = pad
        self.kn = kn

    # ---------------- stage drivers (idempotent, cached) ----------------

    def _pad_points(self, pts: np.ndarray):
        """Pad to the smallest voxel bucket that fits (pts are already
        pre-voxelized, so #voxels per rotation <= #pts <= bucket)."""
        bucket = min(self.cfg.pad.bucket_for(len(pts)), self.pad)
        out = np.zeros((bucket, 3), np.float32)
        n = min(len(pts), bucket)
        out[:n] = pts[:n]
        return self.jnp.asarray(out), n, bucket

    def _sharded_prelift(self, dataset, lift_dir: str, yoho_dir: str) -> None:
        """Fill the FCGF lift cache in device-count-sized batches over
        the (data, group) mesh (clouds x rotations sharded)."""
        jnp = self.jnp
        todo = []
        for pc_id in dataset.pc_ids:
            if os.path.exists(os.path.join(yoho_dir, f"{pc_id}.npy")):
                continue
            if os.path.exists(os.path.join(lift_dir, f"{pc_id}.npy")):
                continue
            pts, dropped = host_prevoxelize(
                dataset.get_pc(pc_id), self.cfg.backbone.voxel_size, self.pad,
                return_dropped=True,
            )
            if dropped:
                self.timer.count("prevoxelize_dropped_voxels", dropped)
                print(f"WARNING: {pc_id}: {dropped} voxels over the "
                      f"{self.pad} cap were dropped", flush=True)
            bucket = min(self.cfg.pad.bucket_for(len(pts)), self.pad)
            todo.append((pc_id, pts, bucket))
        by_bucket: Dict[int, list] = {}
        for item in todo:
            by_bucket.setdefault(item[2], []).append(item)
        n_data = self.lift_mesh.shape["data"]
        for bucket, items in by_bucket.items():
            lift = self.sharded_lift_for_bucket(bucket)
            for i in range(0, len(items), n_data):
                chunk = items[i : i + n_data]
                real = len(chunk)
                chunk = chunk + [chunk[-1]] * (n_data - real)  # pad batch
                points = np.zeros((n_data, bucket, 3), np.float32)
                n_valid = np.zeros((n_data,), np.int32)
                keys = np.stack(
                    [
                        dataset.get_kps(pc_id).astype(np.float32)
                        for pc_id, _, _ in chunk
                    ]
                )
                for j, (_, pts, _) in enumerate(chunk):
                    n = min(len(pts), bucket)
                    points[j, :n] = pts[:n]
                    n_valid[j] = n
                with self.lift_mesh:
                    F = np.asarray(
                        lift(
                            self._fcgf_vars,
                            jnp.asarray(points),
                            jnp.asarray(n_valid),
                            jnp.asarray(keys),
                        )
                    )
                for j in range(real):
                    np.save(
                        os.path.join(lift_dir, f"{chunk[j][0]}.npy"),
                        F[j].astype(np.float16),
                    )

    def extract_group_features(self, dataset, cache_dir: str) -> None:
        """Stage 1+2: FCGF group lifting + PartI descriptors per cloud."""
        base = _ensure(os.path.join(cache_dir, "Testset", dataset.name))
        lift_dir = _ensure(os.path.join(base, "FCGF_Input_Group_feature"))
        yoho_dir = _ensure(os.path.join(base, "YOHO_Output_Group_feature"))
        if self.use_sharded_lift:
            self._sharded_prelift(dataset, lift_dir, yoho_dir)

        todo = [
            pc_id
            for pc_id in dataset.pc_ids
            if not os.path.exists(os.path.join(yoho_dir, f"{pc_id}.npy"))
        ]

        def prep(pc_id):
            """Host side of one cloud (runs in a prefetch thread while
            the device lifts the previous cloud — the async input
            pipeline replacing the reference's 10 dataloader workers,
            YOHO_testset.py:174-176)."""
            lift_fn = os.path.join(lift_dir, f"{pc_id}.npy")
            if os.path.exists(lift_fn):
                return np.load(lift_fn), None
            pts, dropped = host_prevoxelize(
                dataset.get_pc(pc_id),
                self.cfg.backbone.voxel_size,
                self.pad,
                return_dropped=True,
            )
            keys = dataset.get_kps(pc_id).astype(np.float32)
            pts_j, n, bucket = self._pad_points(pts)
            return None, (pts_j, n, bucket, keys, dropped)

        from yoho_tpu.utils.prefetch import prefetch

        # Device-side fusion + depth-1 output pipeline (same treatment
        # as data/trainset.generate_rotated_features, round-5): the lift
        # output feeds PartI WITHOUT a device->host->device bounce, both
        # results stay unmaterialized while the device starts the next
        # cloud, and caches are stored float16 (38 MB f32 -> 19 MB per
        # array through the tunnel + on disk; consumers cast back).
        it = prefetch(prep, todo)
        pending = []  # [(pc_id, F_dev|F_np, eqv_dev)]

        def flush(n_keep: int) -> None:
            while len(pending) > n_keep:
                pid, F_out, eqv_out = pending.pop(0)
                lf = os.path.join(lift_dir, f"{pid}.npy")
                if not os.path.exists(lf):
                    np.save(lf, np.asarray(F_out).astype(np.float16))
                np.save(
                    os.path.join(yoho_dir, f"{pid}.npy"),
                    np.asarray(eqv_out).astype(np.float16),
                )

        for pc_id, (F, raw) in it:
            if F is None:
                pts_j, n, bucket, keys, dropped = raw
                if dropped:
                    self.timer.count("prevoxelize_dropped_voxels", dropped)
                    print(f"WARNING: {pc_id}: {dropped} voxels over the "
                          f"{self.pad} cap were dropped", flush=True)
                lift = self.lift_for_bucket(bucket)
                F = lift(pts_j, n, self.jnp.asarray(keys))  # device array
            else:
                F = self.jnp.asarray(np.asarray(F, np.float32))
            eqv, _ = self.part1_desc(F)
            pending.append((pc_id, F, eqv))
            flush(1)
        flush(0)
        if todo:
            self.timer.count("extract_host_wait_ms", int(it.wait_s * 1000))

    def match_scene(self, dataset, cache_dir: str) -> None:
        """Stage 3+4: mutual matching + DR-index per pair."""
        base = os.path.join(cache_dir, "Testset", dataset.name)
        src = dataset.name.replace("3dLomatch", "3dmatch")
        feat_dir = os.path.join(cache_dir, "Testset", src, "YOHO_Output_Group_feature")
        match_dir = _ensure(os.path.join(base, "Match"))
        dr_dir = _ensure(os.path.join(match_dir, "DR_index"))
        jnp = self.jnp
        for id0, id1 in dataset.pair_ids:
            m_fn = os.path.join(match_dir, f"{id0}-{id1}.npy")
            d_fn = os.path.join(dr_dir, f"{id0}-{id1}.npy")
            if os.path.exists(m_fn) and os.path.exists(d_fn):
                continue
            # caches may be f16 (extract stores them halved); compute f32
            eqv0 = jnp.asarray(
                np.load(os.path.join(feat_dir, f"{id0}.npy")).astype(np.float32)
            )
            eqv1 = jnp.asarray(
                np.load(os.path.join(feat_dir, f"{id1}.npy")).astype(np.float32)
            )
            inv0 = jnp.mean(eqv0, axis=1)
            inv1 = jnp.mean(eqv1, axis=1)
            m, dr = self.match_and_dr(eqv0, inv0, eqv1, inv1)
            c = int(m.count)
            np.save(m_fn, np.asarray(m.pairs)[:c])
            np.save(d_fn, np.asarray(dr)[:c])

    def estimate_scene(
        self,
        dataset,
        cache_dir: str,
        estimator: str = "yoho_c",
        seed: int = 0,
        pairs_per_call: int = 8,
    ) -> None:
        """Stage 5/6: RANSAC + pre.log, all pending pairs batched as
        vmap lanes (``pairs_per_call`` per dispatch to bound the
        (iters, matches) scoring buffers at ~8 x 20 MB). The reference
        instead forks one process per pair (estimator.py:269-273)."""
        import jax

        base = os.path.join(cache_dir, "Testset", dataset.name)
        match_dir = os.path.join(base, "Match")
        sign = "YOHO_C" if estimator == "yoho_c" else "YOHO_O"
        save_dir = _ensure(
            os.path.join(match_dir, sign, f"{self.cfg.ransac.max_iter}iters")
        )
        jnp = self.jnp
        kn = self.kn
        results: Dict[tuple, np.ndarray] = {}
        todo = []
        for idx, (id0, id1) in enumerate(dataset.pair_ids):
            out_fn = os.path.join(save_dir, f"{id0}-{id1}.npz")
            if os.path.exists(out_fn):
                results[(id0, id1)] = np.load(out_fn)["trans"][:3]
            else:
                todo.append((idx, id0, id1, out_fn))

        def load_pair(id0, id1):
            keys0 = dataset.get_kps(id0).astype(np.float32)
            keys1 = dataset.get_kps(id1).astype(np.float32)
            pairs = np.load(os.path.join(match_dir, f"{id0}-{id1}.npy"))
            dr = np.load(os.path.join(match_dir, "DR_index", f"{id0}-{id1}.npy"))
            m = pairs.shape[0]
            pairs_pad = np.zeros((kn, 2), np.int32)
            pairs_pad[:m] = pairs
            mask = np.arange(kn) < m
            dr_pad = np.zeros((kn,), np.int32)
            dr_pad[:m] = dr
            T_pad = None
            if estimator != "yoho_c":
                T = np.load(os.path.join(match_dir, "Trans_pre", f"{id0}-{id1}.npy"))
                T_pad = np.zeros((kn, 3, 4), np.float32)
                T_pad[:m] = T
            return keys0, keys1, pairs_pad, mask, dr_pad, T_pad

        for c0 in range(0, len(todo), pairs_per_call):
            chunk = todo[c0 : c0 + pairs_per_call]
            real = len(chunk)
            chunk = chunk + [chunk[-1]] * (pairs_per_call - real)
            loaded = [load_pair(id0, id1) for _, id0, id1, _ in chunk]
            stack = lambda i: jnp.asarray(np.stack([L[i] for L in loaded]))
            if estimator == "yoho_c":
                keys = jnp.stack(
                    [jax.random.PRNGKey(seed + idx) for idx, _, _, _ in chunk]
                )
                res = self.ransac_c_batch(
                    keys, stack(0), stack(1), stack(2), stack(3), stack(4)
                )
            else:
                res = self.ransac_o_batch(
                    stack(0), stack(1), stack(2), stack(3), stack(5)
                )
            T3b = np.asarray(res.transform)
            best = np.asarray(res.best_iter)
            ovl = np.asarray(res.overlap)
            degen = np.asarray(res.degenerate)
            for j in range(real):
                _, id0, id1, out_fn = chunk[j]
                T4 = np.eye(4)
                T4[:3] = T3b[j]
                # Degenerate vote distribution -> identity + the
                # reference's sentinel recalltime=50001
                # (estimator.py:107-108), not the argmax iteration.
                np.savez(
                    out_fn,
                    trans=T4,
                    recalltime=50001 if degen[j] else int(best[j]),
                    overlap=float(ovl[j]),
                )
                results[(id0, id1)] = T3b[j]
        pairs_out = list(dataset.pair_ids)
        trans_out = [results[(id0, id1)] for id0, id1 in pairs_out]
        rr.write_trajectory(
            os.path.join(save_dir, "pre.log"),
            pairs_out,
            trans_out,
            len(dataset.pc_ids),
        )

    def extract_part2_poses(self, dataset, cache_dir: str) -> None:
        """PartII per-match transforms (requires part2_vars)."""
        assert self._part2_vars is not None, "PartII variables not loaded"
        base = os.path.join(cache_dir, "Testset", dataset.name)
        src = dataset.name.replace("3dLomatch", "3dmatch")
        lift_dir = os.path.join(cache_dir, "Testset", src, "FCGF_Input_Group_feature")
        yoho_dir = os.path.join(cache_dir, "Testset", src, "YOHO_Output_Group_feature")
        match_dir = os.path.join(base, "Match")
        save_dir = _ensure(os.path.join(match_dir, "Trans_pre"))
        jnp = self.jnp
        for id0, id1 in dataset.pair_ids:
            out_fn = os.path.join(save_dir, f"{id0}-{id1}.npy")
            if os.path.exists(out_fn):
                continue
            pairs = np.load(os.path.join(match_dir, f"{id0}-{id1}.npy"))
            dr = np.load(os.path.join(match_dir, "DR_index", f"{id0}-{id1}.npy"))
            bf0 = np.load(os.path.join(lift_dir, f"{id0}.npy"))[pairs[:, 0]].astype(np.float32)
            bf1 = np.load(os.path.join(lift_dir, f"{id1}.npy"))[pairs[:, 1]].astype(np.float32)
            af0 = np.load(os.path.join(yoho_dir, f"{id0}.npy"))[pairs[:, 0]].astype(np.float32)
            af1 = np.load(os.path.join(yoho_dir, f"{id1}.npy"))[pairs[:, 1]].astype(np.float32)
            keys0 = dataset.get_kps(id0).astype(np.float32)[pairs[:, 0]]
            keys1 = dataset.get_kps(id1).astype(np.float32)[pairs[:, 1]]
            m = pairs.shape[0]
            kn = self.kn

            def pad(a, shape):
                out = np.zeros(shape, np.float32)
                out[:m] = a
                return jnp.asarray(out)

            dr_pad = np.zeros((kn,), np.int32)
            dr_pad[:m] = dr
            T = self.part2_poses(
                pad(bf0, (kn, 60, 32)),
                pad(bf1, (kn, 60, 32)),
                pad(af0, (kn, 60, 32)),
                pad(af1, (kn, 60, 32)),
                jnp.asarray(dr_pad),
                pad(keys0, (kn, 3)),
                pad(keys1, (kn, 3)),
            )
            np.save(out_fn, np.asarray(T)[:m])

    # ---------------- evaluation ----------------

    def feature_match_recall(self, dataset, cache_dir: str, tau1: float, tau2: float):
        """FMR per scene (reference tests/evaluator.py:49-71)."""
        match_dir = os.path.join(cache_dir, "Testset", dataset.name, "Match")
        pair_fmrs = []
        for id0, id1 in dataset.pair_ids:
            matches = np.load(os.path.join(match_dir, f"{id0}-{id1}.npy"))
            keys0 = dataset.get_kps(id0)[matches[:, 0]]
            keys1 = dataset.get_kps(id1)[matches[:, 1]]
            gt = dataset.get_transform(id0, id1)
            keys1 = transform_points(keys1, gt)
            dist = np.sqrt(np.sum(np.square(keys0 - keys1), axis=-1))
            pair_fmrs.append(np.mean(dist < tau2))
        pair_fmrs = np.asarray(pair_fmrs)
        return float(np.mean(pair_fmrs > tau1)), pair_fmrs

    def evaluate(
        self,
        datasets: Dict,
        cache_dir: str,
        estimator: str = "yoho_c",
        with_part2: bool = False,
    ) -> Dict:
        """Full protocol: per-scene pipeline + FMR, then RR
        (reference Evaluator_PartI/II.eval)."""
        from yoho_tpu.parallel.multihost import barrier, shard_items
        from yoho_tpu.utils.observability import StageTimer

        cfg = self.cfg
        FMRS, all_pair_fmrs = [], []
        t0 = time.time()
        timer = self.timer  # shared: stage counters accumulate here too
        scenes = [(s, d) for s, d in datasets.items() if s != "wholesetname"]
        # Multi-host: each process runs the device stages for its scene
        # shard (cache files land on the shared FS); single-process this
        # is the full list. The FMR/RR pass below reads ALL scenes from
        # cache after the barrier.
        for scene, dataset in shard_items(scenes):
            if not dataset.name.startswith("3dLomatch"):
                with timer("extract"):
                    self.extract_group_features(dataset, cache_dir)
            with timer("match"):
                self.match_scene(dataset, cache_dir)
            if with_part2:
                with timer("part2"):
                    self.extract_part2_poses(dataset, cache_dir)
            with timer("ransac"):
                self.estimate_scene(dataset, cache_dir, estimator)
        barrier("yoho-eval-stages")
        for scene, dataset in scenes:
            with timer("fmr"):
                fmr, pair_fmrs = self.feature_match_recall(
                    dataset, cache_dir, cfg.ransac.fmr_ratio, cfg.ransac.ok_match_dist_threshold
                )
            FMRS.append(fmr)
            all_pair_fmrs.append(pair_fmrs)
        sign = "YOHO_C" if estimator == "yoho_c" else "YOHO_O"
        mean_rr, c_flags, c_errors = rr.benchmark(
            datasets,
            cache_dir,
            cfg.ransac.max_iter,
            yoho_sign=sign,
            rr_dist_threshold=cfg.ransac.rr_dist_threshold,
        )
        out = {
            "FMR": float(np.mean(FMRS)),
            "inlier_ratio": float(np.mean(np.concatenate(all_pair_fmrs))),
            "registration_recall": mean_rr,
            "wall_s": time.time() - t0,
            "stage_times": timer.report(),
        }
        _ensure(os.path.join(cache_dir))
        with open(os.path.join(cache_dir, "results.log"), "a") as f:
            f.write(f"{datasets['wholesetname']}-{estimator}: {out}\n")
        return out
