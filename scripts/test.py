"""Evaluate YOHO-C / YOHO-O on a test dataset (reference ``Test.py``).

Usage:
  python scripts/test.py --part PartI  --dataset 3dmatch --max-iter 1000
  python scripts/test.py --part PartII --dataset 3dLomatch --ransac-d 0.2

Requires trained checkpoints (scripts/train.py, scripts/train_fcgf.py)
and the dataset under --origin-dir in the reference layout.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["PartI", "PartII"], default="PartI")
    ap.add_argument("--dataset", default="3dmatch")
    ap.add_argument("--max-iter", type=int, default=1000)
    ap.add_argument("--origin-dir", default="./data/origin_data")
    ap.add_argument("--cache-dir", default="./data/YOHO_TPU")
    ap.add_argument("--model-dir", default="./model")
    ap.add_argument("--ransac-d", type=float, default=-1)
    ap.add_argument("--tau-1", type=float, default=0.05)
    ap.add_argument("--tau-2", type=float, default=0.1)
    ap.add_argument("--tau-3", type=float, default=0.2)
    ap.add_argument("--out-json", default=None, help="write the result dict as JSON")
    ap.add_argument(
        "--allow-random",
        action="store_true",
        help="permit evaluating randomly-initialized networks when a "
        "checkpoint is missing (otherwise a missing checkpoint is an error)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    from yoho_tpu.parallel.multihost import maybe_initialize

    maybe_initialize()
    import jax.numpy as jnp

    from yoho_tpu.config import default_config
    from yoho_tpu.data.dataset import get_datasets
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.part1 import PartINetwork
    from yoho_tpu.models.part2 import PartIINetwork
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.pipeline.runner import PipelineRunner
    from yoho_tpu.train.steps import init_train_state, make_optimizer
    from yoho_tpu.train.trainer import load_checkpoint

    cfg = default_config().for_dataset(args.dataset)
    cfg.ransac = dataclasses.replace(
        cfg.ransac,
        max_iter=args.max_iter,
        fmr_ratio=args.tau_1,
        ok_match_dist_threshold=args.tau_2,
        rr_dist_threshold=args.tau_3,
    )
    if args.ransac_d > 0:
        cfg.ransac = dataclasses.replace(
            cfg.ransac, inlier_dist_c=args.ransac_d, inlier_dist_o=args.ransac_d
        )

    def load_vars(model, init_args, ckpt):
        v0 = model.init(jax.random.PRNGKey(0), *init_args)
        template = init_train_state(v0, make_optimizer(cfg.train, 1))
        if os.path.exists(ckpt):
            state, best = load_checkpoint(ckpt, template)
            print(f"loaded {ckpt} (best {best})")
            return {"params": state.params, "batch_stats": state.batch_stats}
        if not args.allow_random:
            sys.exit(
                f"ERROR: no checkpoint at {ckpt} — refusing to evaluate "
                "random weights (pass --allow-random to override)"
            )
        print(f"WARNING: no checkpoint at {ckpt}; using random init")
        return v0

    pad = cfg.pad.max_voxels
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
    p2_vars = None
    if args.part == "PartII":
        part2 = PartIINetwork(cfg.part2)
        f = jnp.zeros((8, 60, 32), jnp.float32)
        p2_vars = load_vars(
            part2,
            (f, f, f, f, jnp.zeros(8, jnp.int32), False),
            os.path.join(args.model_dir, "PartII", "model_best.pkl"),
        )

    datasets = get_datasets(args.dataset, args.origin_dir)
    runner = PipelineRunner(cfg, fcgf_vars, p1_vars, p2_vars)
    out = runner.evaluate(
        datasets,
        args.cache_dir,
        estimator="yoho_c" if args.part == "PartI" else "yoho_o",
        with_part2=args.part == "PartII",
    )
    print(out)
    if args.out_json:
        import json

        os.makedirs(os.path.dirname(os.path.abspath(args.out_json)), exist_ok=True)
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
