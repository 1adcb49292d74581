"""Generate the PartI/PartII training set (reference ``YOHO_Trainset.py``).

Stages (idempotent): keypoint PCA filter + gt pair mining, 5-random-
rotation x 60-group feature lifting with the trained FCGF backbone,
batch baking, validation set.

Usage: python scripts/trainset_gen.py --origin-dir ./data/origin_data \
         --output-dir ./data/YOHO_TPU [--stage all|filter|lift|bake]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--origin-dir", default="./data/origin_data")
    ap.add_argument("--output-dir", default="./data/YOHO_TPU")
    ap.add_argument("--model-dir", default="./model")
    ap.add_argument("--dataset", default="3dmatch_train")
    ap.add_argument(
        "--val-scenes",
        default=None,
        help="comma-separated held-out scenes (default: the 3dmatch VAL_SCENES)",
    )
    ap.add_argument("--stage", default="all", choices=["all", "filter", "lift", "bake"])
    ap.add_argument(
        "--scenes",
        default=None,
        help="comma-separated scene subset to bake from (default: all). "
        "Lets the FCGF corpus grow (cheap, fights backbone overfit) "
        "without scaling the 5x60-lift cost of PartI trainset baking.",
    )
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    import jax.numpy as jnp

    from yoho_tpu.config import default_config
    from yoho_tpu.data.dataset import VAL_SCENES, get_datasets
    from yoho_tpu.data import trainset as ts
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.pipeline.lifting import lift_group_features
    from yoho_tpu.pipeline.runner import host_prevoxelize
    from yoho_tpu.train.steps import init_train_state, make_optimizer
    from yoho_tpu.train.trainer import load_checkpoint

    cfg = default_config()
    val_scenes = (
        VAL_SCENES if args.val_scenes is None else args.val_scenes.split(",")
    )
    datasets = get_datasets(args.dataset, args.origin_dir)
    if args.scenes:
        keep = set(args.scenes.split(","))
        datasets = {
            k: v
            for k, v in datasets.items()
            if k in ("wholesetname", "valscenes") or k in keep
        }

    if args.stage in ("all", "filter"):
        ts.filter_keypoints_and_pairs(datasets, args.output_dir, val_scenes)

    if args.stage in ("all", "lift"):
        pad = cfg.pad.max_voxels
        model = SparseResUNet(cfg.backbone)
        pts0 = jnp.zeros((pad, 3), jnp.float32)
        g0, _ = jax.jit(lambda p: build_grid(p, cfg.backbone.voxel_size, 10))(pts0)
        plan0 = jax.jit(lambda g: build_unet_plan(g, cfg.backbone.conv1_kernel_size))(g0)
        v0 = model.init(jax.random.PRNGKey(0), jnp.ones((pad, 1), jnp.float32), plan0, False)
        ckpt = os.path.join(args.model_dir, "Backbone", "model_best.pkl")
        if os.path.exists(ckpt):
            state, _ = load_checkpoint(
                ckpt, init_train_state(v0, make_optimizer(cfg.train, 1))
            )
            fcgf_vars = {"params": state.params, "batch_stats": state.batch_stats}
        else:
            print(f"WARNING: no backbone checkpoint at {ckpt}; random init")
            fcgf_vars = v0

        fcgf_apply = lambda v, f, p: model.apply(v, f, p, False)
        kn_pad = cfg.pad.num_keypoints

        # One jitted lift per voxel bucket (same bucketing as the
        # production runner): every sort/search/gather in the plan
        # scales with the pad, so a ~15k-voxel cloud on the 16k bucket
        # costs half the full-pad lift.
        lift_cache = {}

        def lift_for_bucket(bucket):
            if bucket not in lift_cache:
                # cast to f16 ON DEVICE: halves the D2H transfer (round-4
                # measurement: host I/O was ~2/3 of the 26 s/cloud pace,
                # docs/PERF.md) and the on-disk Rotated_Features cache
                lift_cache[bucket] = jax.jit(
                    lambda points, n, keys: lift_group_features(
                        fcgf_apply, fcgf_vars, points, n, keys,
                        cfg.backbone.voxel_size, cfg.backbone.conv1_kernel_size,
                        rotations_per_batch=6,
                    ).astype(jnp.float16)
                )
            return lift_cache[bucket]

        def lift_fn(pc_r, keys_r):
            # returns an UNMATERIALIZED device array + the valid keypoint
            # count; generate_rotated_features pipelines the D2H pulls
            # one cloud behind the dispatches
            reps = host_prevoxelize(pc_r, cfg.backbone.voxel_size, pad)
            bucket = min(cfg.pad.bucket_for(len(reps)), pad)
            pts = np.zeros((bucket, 3), np.float32)
            n = min(len(reps), bucket)
            pts[:n] = reps[:n]
            kn = len(keys_r)
            keys_pad = np.zeros((kn_pad, 3), np.float32)
            keys_pad[: min(kn, kn_pad)] = keys_r[:kn_pad]
            lift = lift_for_bucket(bucket)
            return lift(jnp.asarray(pts), n, jnp.asarray(keys_pad)), min(kn, kn_pad)

        ts.generate_rotated_features(lift_fn, datasets, args.output_dir, pad)

    if args.stage in ("all", "bake"):
        # exists-skip like every other stage (idempotent reruns/resume)
        tv = os.path.join(args.output_dir, "Train_val_list")
        if os.path.exists(os.path.join(tv, "train.pkl")):
            print("train batches already baked; skipping")
        else:
            n = ts.bake_train_batches(datasets, args.output_dir, val_scenes)
            print(f"baked {n} train batches")
        if os.path.exists(os.path.join(tv, "val.pkl")):
            print("val batches already baked; skipping")
        else:
            m = ts.bake_val_batches(datasets, args.output_dir, val_scenes)
            print(f"baked {m} val batches")


if __name__ == "__main__":
    sys.exit(main())
