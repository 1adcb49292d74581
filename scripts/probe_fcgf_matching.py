"""FCGF matching-quality probe: the ground-truth training signal.

For held-out aligned fragment pairs, voxelize both clouds, run the
backbone (eval mode), mutual-NN match the voxel features, and report the
inlier fraction (< ``--inlier-dist``), against two built-in baselines:

* coordinate-oracle ceiling (match on xyz — what perfect features give),
* random-init floor.

Also prints the collapse statistics (d_pos at oracle correspondences,
d_rand at random cross pairs, in-cloud spread) that diagnosed the
round-4 feature collapse (docs/FCGF_TRAINING.md). Use THIS, not the
held-out contrastive loss, to compare backbone checkpoints.

Usage:
  python scripts/probe_fcgf_matching.py [ckpt.pkl ...] \
      [--dataset synth_train --scene scene_05] [--pairs 6]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpts", nargs="*", default=[])
    ap.add_argument("--origin-dir", default="./data/origin_data")
    ap.add_argument("--dataset", default="synth_train")
    ap.add_argument("--scene", default="scene_05")
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--pad", type=int, default=16384)
    ap.add_argument("--inlier-dist", type=float, default=0.10)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from yoho_tpu.config import default_config
    from yoho_tpu.data.dataset import get_datasets
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.pipeline.runner import host_prevoxelize
    from yoho_tpu.train.steps import init_train_state, make_optimizer
    from yoho_tpu.train.trainer import load_checkpoint

    cfg = default_config()
    vs = cfg.backbone.voxel_size
    pad = args.pad
    model = SparseResUNet(cfg.backbone)
    p0 = jnp.zeros((pad, 3), jnp.float32)
    g0, _ = jax.jit(lambda p: build_grid(p, vs, 10))(p0)
    plan0 = jax.jit(lambda g: build_unet_plan(g, cfg.backbone.conv1_kernel_size))(g0)
    v0 = model.init(
        jax.random.PRNGKey(0), jnp.ones((pad, 1), jnp.float32), plan0, False
    )

    # NOTE: variables must be a jit ARGUMENT — a closed-over global is
    # baked in at first trace and silently reused for later checkpoints.
    @jax.jit
    def featurize(variables, points, n):
        grid, first = build_grid(points, vs, n)
        plan = build_unet_plan(grid, cfg.backbone.conv1_kernel_size)
        f = model.apply(variables, jnp.ones((pad, 1), jnp.float32), plan, False)
        return f, points[first], plan.mask1

    from yoho_tpu.train.probe import collapse_stats, probe_inlier_fractions

    ds = get_datasets(args.dataset, args.origin_dir)[args.scene]
    pairs = ds.pair_ids[: args.pairs]
    clouds = {}

    def cloud(i):
        # random (NOT prefix) subsample happens inside the probe module;
        # voxel rows are key-sorted, a prefix is one spatial corner
        if i not in clouds:
            reps = host_prevoxelize(ds.get_pc(i), vs, pad)
            p = np.zeros((pad, 3), np.float32)
            n = min(len(reps), pad)
            p[:n] = reps[:n]
            clouds[i] = (jnp.asarray(p), n)
        return clouds[i]

    pair_clouds = [(cloud(a), cloud(b)) for a, b in pairs]

    def scorer(variables):
        fz = lambda p, n: tuple(np.asarray(x) for x in featurize(variables, p, n))

        def frac(oracle=False):
            return probe_inlier_fractions(
                fz, pair_clouds, inlier_dist=args.inlier_dist, oracle=oracle
            )

        def stats(tag):
            st = collapse_stats(fz, pair_clouds[0])
            print(
                f"{tag}: d_pos={st['d_pos']:.3f} d_rand={st['d_rand']:.3f} "
                f"ratio={st['ratio']:.2f} spread={st['spread']:.3f}",
                flush=True,
            )

        return frac, stats

    frac0, stats0 = scorer(v0)
    o = frac0(oracle=True)
    print(f"coordinate-oracle ceiling: mean={np.mean(o):.3f}", flush=True)
    r = frac0()
    print(f"random-init floor: mean={np.mean(r):.3f}", flush=True)
    stats0("random-init")
    for name in args.ckpts:
        state = init_train_state(v0, make_optimizer(cfg.train, 1))
        state, _ = load_checkpoint(name, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        frac, stats = scorer(variables)
        fr = frac()
        print(
            f"{name} step={int(state.step)}: "
            f"{['%.3f' % f for f in fr]} mean={np.mean(fr):.3f}",
            flush=True,
        )
        stats(f"  {name}")


if __name__ == "__main__":
    main()
