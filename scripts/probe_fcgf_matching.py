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

    ds = get_datasets(args.dataset, args.origin_dir)[args.scene]
    pairs = ds.pair_ids[: args.pairs]
    rng = np.random.default_rng(0)
    clouds = {}

    def cloud(i):
        if i not in clouds:
            reps = host_prevoxelize(ds.get_pc(i), vs, pad)
            p = np.zeros((pad, 3), np.float32)
            n = min(len(reps), pad)
            p[:n] = reps[:n]
            clouds[i] = (jnp.asarray(p), n)
        return clouds[i]

    def inlier_frac(variables, oracle=False):
        fr = []
        for a, b in pairs:
            (pa, na), (pb, nb) = cloud(a), cloud(b)
            fa, xa, ma = map(np.asarray, featurize(variables, pa, na))
            fb, xb, mb = map(np.asarray, featurize(variables, pb, nb))
            # random (NOT prefix) subsample: voxel rows are key-sorted,
            # a prefix is one spatial corner of the cloud
            ia = rng.permutation(np.where(ma)[0])[:4000]
            ib = rng.permutation(np.where(mb)[0])[:4000]
            if oracle:
                d = -((xa[ia][:, None, :] - xb[ib][None, :, :]) ** 2).sum(-1)
            else:
                d = fa[ia] @ fb[ib].T
            nn_ab = d.argmax(1)
            nn_ba = d.argmax(0)
            mutual = nn_ba[nn_ab] == np.arange(len(ia))
            if mutual.sum() == 0:
                fr.append(0.0)
                continue
            dist = np.linalg.norm(xa[ia][mutual] - xb[ib][nn_ab[mutual]], axis=1)
            fr.append(float((dist < args.inlier_dist).mean()))
        return fr

    def collapse_stats(variables, tag):
        a, b = pairs[0]
        (pa, na), (pb, nb) = cloud(a), cloud(b)
        fa, xa, ma = map(np.asarray, featurize(variables, pa, na))
        fb, xb, mb = map(np.asarray, featurize(variables, pb, nb))
        ia = rng.permutation(np.where(ma)[0])[:3000]
        ib_all = np.where(mb)[0]
        d2 = ((xa[ia][:, None, :] - xb[ib_all][None, :, :]) ** 2).sum(-1)
        nn = d2.argmin(1)
        ok = np.sqrt(d2[np.arange(len(ia)), nn]) < 0.05
        fpos_a = fa[ia][ok]
        d_pos = np.linalg.norm(fpos_a - fb[ib_all[nn[ok]]], axis=1).mean()
        jr = rng.permutation(ib_all)[: int(ok.sum())]
        d_rand = np.linalg.norm(fpos_a - fb[jr], axis=1).mean()
        s = fa[rng.permutation(np.where(ma)[0])[:1000]]
        spread = np.linalg.norm(s[:500, None] - s[None, 500:1000], axis=-1).mean()
        print(
            f"{tag}: d_pos={d_pos:.3f} d_rand={d_rand:.3f} "
            f"ratio={d_rand / max(d_pos, 1e-9):.2f} spread={spread:.3f}",
            flush=True,
        )

    o = inlier_frac(v0, oracle=True)
    print(f"coordinate-oracle ceiling: mean={np.mean(o):.3f}", flush=True)
    r = inlier_frac(v0)
    print(f"random-init floor: mean={np.mean(r):.3f}", flush=True)
    collapse_stats(v0, "random-init")
    for name in args.ckpts:
        state = init_train_state(v0, make_optimizer(cfg.train, 1))
        state, _ = load_checkpoint(name, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fr = inlier_frac(variables)
        print(
            f"{name} step={int(state.step)}: "
            f"{['%.3f' % f for f in fr]} mean={np.mean(fr):.3f}",
            flush=True,
        )
        collapse_stats(variables, f"  {name}")


if __name__ == "__main__":
    main()
