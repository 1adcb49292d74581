"""Benchmark: fragment-pairs/s on a synthetic 3DMatch-scale workload.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N/BASELINE}

Workload (per the 3DMatch protocol shapes, reference BASELINE.md):
  clouds: 20k points (padded 32768 voxv slots), 5,000 keypoints,
  60-rotation FCGF lift, PartI descriptors, mutual match, DR-index,
  YOHO-C RANSAC @ 1000 iters.

The end-to-end metric folds per-cloud work into per-pair cost with the
3DMatch test-set mix: 1,623 pairs over 433 fragments -> 0.2668
clouds/pair:
  pairs_per_s = 1 / (0.2668 * (t_lift + t_desc) + t_pair)

BASELINE = 0.33 pairs/s: estimated RTX 2080Ti reference throughput from
its own configs (no in-repo numbers exist, SURVEY.md §6): 60 FCGF
passes/cloud at batch 4 (~5-6 s/cloud, YOHO_testset.py:174-176), PartI
batches of 900 (~0.4 s/cloud), kNN match + 1k-iter numpy RANSAC
(~1.4 s/pair, tests/estimator.py) -> ~3.0 s/pair mix cost.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_S = 0.33
CLOUDS_PER_PAIR = 433 / 1623


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from yoho_tpu.config import default_config
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.part1 import PartINetwork, des2dr
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.pipeline.lifting import lift_group_features
    from yoho_tpu.pipeline.matching import mutual_match
    from yoho_tpu.pipeline.ransac import yoho_c_ransac

    cfg = default_config()
    kn = cfg.pad.num_keypoints  # 5000
    n_pts, pad = 20000, cfg.pad.max_voxels
    rng = np.random.default_rng(0)
    log(f"bench: devices={jax.devices()} pad={pad} keypoints={kn}")

    # Surface-like cloud (2-manifold-ish: more realistic voxel stats
    # than uniform volume noise).
    def make_cloud():
        u = rng.uniform(0, 2 * np.pi, n_pts)
        v = rng.uniform(0, np.pi, n_pts)
        r = 1.0 + 0.25 * np.sin(3 * u) * np.cos(2 * v)
        pts = np.stack(
            [r * np.sin(v) * np.cos(u), r * np.sin(v) * np.sin(u), r * np.cos(v)],
            axis=1,
        )
        pts += rng.normal(scale=0.01, size=pts.shape)
        return pts.astype(np.float32)

    cloud1 = make_cloud()
    from yoho_tpu.group import get_group
    from yoho_tpu.pipeline.runner import host_prevoxelize

    R = get_group().rotations[13].astype(np.float32)
    cloud0 = (cloud1 @ R.T).astype(np.float32)
    keys1 = cloud1[rng.choice(n_pts, kn, replace=False)]
    keys0 = (keys1 @ R.T).astype(np.float32)

    # pre-voxelize + bucket like the production runner does
    cloud0 = host_prevoxelize(cloud0, cfg.backbone.voxel_size, pad)
    cloud1 = host_prevoxelize(cloud1, cfg.backbone.voxel_size, pad)
    bucket = min(
        cfg.pad.bucket_for(max(len(cloud0), len(cloud1))), pad
    )
    log(f"prevoxelized: {len(cloud0)}/{len(cloud1)} pts -> bucket {bucket}")

    def pad_pts(c):
        out = np.zeros((bucket, 3), np.float32)
        out[: len(c)] = c
        return jnp.asarray(out)

    model = SparseResUNet(cfg.backbone)
    part1 = PartINetwork(cfg.part1)

    small = pad_pts(cloud1[:2000])[:4096]
    g0, _ = jax.jit(lambda p: build_grid(p, cfg.backbone.voxel_size, 2000))(small)
    plan0 = jax.jit(lambda g: build_unet_plan(g, cfg.backbone.conv1_kernel_size))(g0)
    fcgf_vars = model.init(
        jax.random.PRNGKey(0), jnp.ones((4096, 1), jnp.float32), plan0, False
    )
    p1_vars = part1.init(jax.random.PRNGKey(1), jnp.zeros((8, 60, 32), jnp.float32), False)

    fcgf_apply = lambda v, f, p: model.apply(v, f, p, False)

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
            rotations_per_batch=4,
        )

    @jax.jit
    def descriptors(F):
        out = part1.apply(p1_vars, F, False)
        return out["eqv"], out["inv"]

    @jax.jit
    def register_pair(key, eqv0, inv0, eqv1, inv1, k0, k1):
        match = mutual_match(inv0, inv1)
        dr = des2dr(eqv1[match.pairs[:, 1]], eqv0[match.pairs[:, 0]])
        return yoho_c_ransac(
            key,
            k0,
            k1,
            match.pairs,
            match.mask,
            dr,
            max_iter=1000,
            inlier_dist=cfg.ransac.inlier_dist_c,
        )

    p0, p1_, k0j, k1j = pad_pts(cloud0), pad_pts(cloud1), jnp.asarray(keys0), jnp.asarray(keys1)

    t0 = time.time()
    F0 = lift(p0, len(cloud0), k0j)
    F0.block_until_ready()
    log(f"lift compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    F1 = lift(p1_, len(cloud1), k1j)
    F1.block_until_ready()
    t_lift = time.time() - t0
    log(f"lift steady: {t_lift:.2f}s")

    eqv0, inv0 = jax.block_until_ready(descriptors(F0))
    t0 = time.time()
    eqv1, inv1 = jax.block_until_ready(descriptors(F1))
    t_desc = time.time() - t0
    log(f"desc steady: {t_desc:.3f}s")

    res = register_pair(jax.random.PRNGKey(0), eqv0, inv0, eqv1, inv1, k0j, k1j)
    jax.block_until_ready(res)
    reps = 5
    t0 = time.time()
    for i in range(reps):
        res = register_pair(jax.random.PRNGKey(i), eqv0, inv0, eqv1, inv1, k0j, k1j)
    jax.block_until_ready(res)
    t_pair = (time.time() - t0) / reps
    log(f"pair steady: {t_pair:.3f}s overlap={float(res.overlap):.3f}")

    per_pair = CLOUDS_PER_PAIR * (t_lift + t_desc) + t_pair
    pairs_per_s = 1.0 / per_pair
    print(
        json.dumps(
            {
                "metric": "fragment_pairs_per_sec_3dmatch_mix",
                "value": round(pairs_per_s, 4),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
                "detail": {
                    "t_lift_s": round(t_lift, 3),
                    "t_desc_s": round(t_desc, 4),
                    "t_pair_s": round(t_pair, 4),
                    "overlap": round(float(res.overlap), 3),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
