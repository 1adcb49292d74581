"""Register one real fragment pair end-to-end (reference ``Demo.py``).

Runs PartI extract -> match -> DR-index -> YOHO-C RANSAC (and YOHO-O if
a PartII checkpoint exists) on the demo kitchen pair, printing the
inlier ratio like the reference (``Demo.py:66``).

Usage: python scripts/demo.py [--origin-dir ./data/origin_data]
Falls back with a clear message if the demo data is absent (the
reference mirror strips the ply blobs); use scripts/demo_synthetic.py
for a data-free end-to-end check.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--origin-dir", default="./data/origin_data")
    ap.add_argument("--cache-dir", default="./data/YOHO_TPU")
    ap.add_argument("--model-dir", default="./model")
    args = ap.parse_args()

    demo_root = os.path.join(args.origin_dir, "demo", "kitchen")
    if not os.path.exists(os.path.join(demo_root, "PointCloud", "cloud_bin_0.ply")):
        print(
            f"demo data not found under {demo_root} (ply blobs are stripped "
            "from this mirror). Run scripts/demo_synthetic.py instead."
        )
        return 1

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    import jax.numpy as jnp

    from yoho_tpu.config import default_config
    from yoho_tpu.data.dataset import get_datasets
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.part1 import PartINetwork
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.pipeline.runner import PipelineRunner
    from yoho_tpu.train.steps import init_train_state, make_optimizer
    from yoho_tpu.train.trainer import load_checkpoint
    from yoho_tpu.utils.so3 import transform_points

    cfg = default_config().for_dataset("demo")
    pad = cfg.pad.max_voxels

    def load_vars(model, init_args, ckpt):
        v0 = model.init(jax.random.PRNGKey(0), *init_args)
        if os.path.exists(ckpt):
            state, _ = load_checkpoint(
                ckpt, init_train_state(v0, make_optimizer(cfg.train, 1))
            )
            return {"params": state.params, "batch_stats": state.batch_stats}
        print(f"WARNING: missing {ckpt}; random init")
        return v0

    fcgf = SparseResUNet(cfg.backbone)
    pts = jnp.zeros((pad, 3), jnp.float32)
    g0, _ = jax.jit(lambda p: build_grid(p, cfg.backbone.voxel_size, 10))(pts)
    plan0 = jax.jit(lambda g: build_unet_plan(g, cfg.backbone.conv1_kernel_size))(g0)
    fcgf_vars = load_vars(
        fcgf,
        (jnp.ones((pad, 1), jnp.float32), plan0, False),
        os.path.join(args.model_dir, "Backbone", "model_best.pkl"),
    )
    part1 = PartINetwork(cfg.part1)
    p1_vars = load_vars(
        part1,
        (jnp.zeros((8, 60, 32), jnp.float32), False),
        os.path.join(args.model_dir, "PartI", "model_best.pkl"),
    )

    datasets = get_datasets("demo", args.origin_dir)
    ds = datasets["kitchen"]
    runner = PipelineRunner(cfg, fcgf_vars, p1_vars)
    runner.extract_group_features(ds, args.cache_dir)
    runner.match_scene(ds, args.cache_dir)
    runner.estimate_scene(ds, args.cache_dir, "yoho_c")

    id0, id1 = ds.pair_ids[0]
    d = np.load(
        os.path.join(
            args.cache_dir, "Testset", ds.name, "Match", "YOHO_C",
            f"{cfg.ransac.max_iter}iters", f"{id0}-{id1}.npz",
        )
    )
    T = d["trans"]
    matches = np.load(
        os.path.join(args.cache_dir, "Testset", ds.name, "Match", f"{id0}-{id1}.npy")
    )
    k0 = ds.get_kps(id0)[matches[:, 0]]
    k1 = transform_points(ds.get_kps(id1)[matches[:, 1]], T)
    inlier = np.mean(np.linalg.norm(k0 - k1, axis=1) < cfg.ransac.ok_match_dist_threshold)
    print(f"pair {id0}-{id1}: estimated transform:\n{T}")
    print(f"Matched inlier ratio {inlier:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
