"""Train the FCGF backbone from scratch on 3dmatch_train fragments.

The reference ships a pre-trained torch checkpoint (stripped from the
mirror) and trains FCGF outside the repo (``others/Readme.md:55-57``);
this script owns that recipe: hardest-contrastive loss on aligned
fragment pairs with random-rotation augmentation.

Usage: python scripts/train_fcgf.py --origin-dir ./data/origin_data \
         [--steps 30000] [--model-dir ./model]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--origin-dir", default="./data/origin_data")
    ap.add_argument("--model-dir", default="./model")
    ap.add_argument("--dataset", default="3dmatch_train")
    ap.add_argument(
        "--val-scenes",
        default=None,
        help="comma-separated scenes to hold out (default: the 3dmatch VAL_SCENES)",
    )
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--max-seconds", type=float, default=0, help="wall-clock cap (0 = none)")
    ap.add_argument("--val-interval", type=int, default=2000)
    ap.add_argument("--save-interval", type=int, default=1000)
    ap.add_argument("--n-pos", type=int, default=512)
    ap.add_argument(
        "--batch-pairs", type=int, default=4,
        help="fragment pairs per optimizer step, as vmap lanes of one "
        "dispatch (reference FCGF recipe: batch 4, README.md:127); "
        ">1 device uses one pair per device instead",
    )
    ap.add_argument(
        "--select", default="probe", choices=["probe", "val_loss"],
        help="best-checkpoint selector: mutual-NN matching probe on "
        "held-out pairs (ground-truth signal, docs/FCGF_TRAINING.md) "
        "or the held-out contrastive loss (round-4 legacy)",
    )
    ap.add_argument("--probe-pairs", type=int, default=6)
    ap.add_argument("--probe-inlier-dist", type=float, default=0.10)
    ap.add_argument("--pos-margin", type=float, default=0.1)
    ap.add_argument(
        "--neg-margin", type=float, default=1.4,
        help="FCGF-published default; on L2-normalized features use a "
        "sphere-scaled value (~0.7) — see docs/FCGF_TRAINING.md",
    )
    ap.add_argument(
        "--reset-best",
        action="store_true",
        help="forget the stored best val loss on resume (required when the "
        "corpus — and therefore the held-out val pair set — changed: the "
        "old best was measured on different data and would gate "
        "model_best saves forever)",
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
    import optax

    from yoho_tpu.config import default_config
    from yoho_tpu.data.dataset import VAL_SCENES, get_datasets
    from yoho_tpu.data.fcgf_pairs import make_fcgf_batch
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.pipeline.runner import host_prevoxelize
    from yoho_tpu.train.fcgf import fcgf_eval_loss, fcgf_train_step
    from yoho_tpu.train.steps import init_train_state
    from yoho_tpu.train.trainer import load_checkpoint, save_checkpoint

    cfg = default_config()
    pad = cfg.pad.max_voxels
    vs = cfg.backbone.voxel_size
    model = SparseResUNet(cfg.backbone)
    rng = np.random.default_rng(0)

    val_scenes = (
        VAL_SCENES if args.val_scenes is None else args.val_scenes.split(",")
    )
    datasets = get_datasets(args.dataset, args.origin_dir)
    pair_list, val_pair_list = [], []
    for scene, ds in datasets.items():
        if scene == "wholesetname":
            continue
        target = val_pair_list if scene in val_scenes else pair_list
        for p in ds.pair_ids:
            target.append((ds, p))
    print(f"{len(pair_list)} training pairs, {len(val_pair_list)} val pairs")

    cloud_cache = {}

    def get_cloud(ds, pc_id):
        k = (ds.name, pc_id)
        if k not in cloud_cache:
            cloud_cache[k] = host_prevoxelize(ds.get_pc(pc_id), vs, pad)
            if len(cloud_cache) > 64:
                cloud_cache.pop(next(iter(cloud_cache)))
        return cloud_cache[k]

    def sample_batch():
        ds, (a, b) = pair_list[rng.integers(0, len(pair_list))]
        return make_fcgf_batch(
            get_cloud(ds, a), get_cloud(ds, b), vs, pad, n_pos=args.n_pos, rng=rng
        )

    def sample_batch_stack(n):
        bs = [sample_batch() for _ in range(n)]
        return {k: np.stack([b[k] for b in bs]) for k in bs[0]}

    pts = jnp.zeros((pad, 3), jnp.float32)
    g0, _ = jax.jit(lambda p: build_grid(p, vs, 10))(pts)
    plan0 = jax.jit(lambda g: build_unet_plan(g, cfg.backbone.conv1_kernel_size))(g0)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((pad, 1), jnp.float32), plan0, False
    )
    schedule = optax.exponential_decay(args.lr, max(args.steps // 4, 1), 0.5)
    opt = optax.adam(schedule)
    state = init_train_state(variables, opt)

    model_dir = os.path.join(args.model_dir, "Backbone")
    os.makedirs(model_dir, exist_ok=True)
    ckpt = os.path.join(model_dir, "model.pkl")
    best_fn = os.path.join(model_dir, "model_best.pkl")
    best = 1e9
    if os.path.exists(ckpt):
        state, best = load_checkpoint(ckpt, state)
        print(f"resumed at step {int(state.step)}")
        if args.reset_best:
            print(f"--reset-best: dropping stored best {best:.4f}")
            best = 1e9
        elif args.select == "probe" and 0 < best < 1e9:
            # stored best is a contrastive-loss value (old selector);
            # probe values are stored negated (in [-1, 0])
            print(f"selector changed to probe: dropping stored best {best:.4f}")
            best = 1e9

    # >1 device: data-parallel step, one fragment pair per device with
    # pmean'd gradients (parallel/sharded.py; DDP analog). 1 device:
    # the plain jitted step. Both advance state.step by 1 per call.
    n_dev = jax.device_count()
    if n_dev > 1:
        from yoho_tpu.parallel.mesh import make_mesh
        from yoho_tpu.parallel.sharded import make_fcgf_train_step_dp

        dp_mesh = make_mesh(n_dev, 1)
        dp_fn = make_fcgf_train_step_dp(
            dp_mesh, model, opt, vs, cfg.backbone.conv1_kernel_size,
            pos_margin=args.pos_margin, neg_margin=args.neg_margin,
        )
        print(f"data-parallel training over {n_dev} devices (1 pair/device)")

        make_step_batch = lambda _: sample_batch_stack(n_dev)

        def step_fn(s, b, k):
            with dp_mesh:
                return dp_fn(s, b, k)

    elif args.batch_pairs > 1:
        from yoho_tpu.train.fcgf import fcgf_train_step_batched

        print(
            f"batched training: {args.batch_pairs} pairs/step "
            f"({os.environ.get('YOHO_FCGF_BATCH_MODE', 'map')} mode)"
        )
        make_step_batch = lambda _: sample_batch_stack(args.batch_pairs)
        step_fn = jax.jit(
            lambda s, b, k: fcgf_train_step_batched(
                model, opt, s, b, vs, cfg.backbone.conv1_kernel_size, k,
                pos_margin=args.pos_margin, neg_margin=args.neg_margin,
            )
        )
    else:
        make_step_batch = lambda _: sample_batch()
        step_fn = jax.jit(
            lambda s, b, k: fcgf_train_step(
                model, opt, s, b, vs, cfg.backbone.conv1_kernel_size, k,
                pos_margin=args.pos_margin, neg_margin=args.neg_margin,
            )
        )
    eval_fn = jax.jit(
        lambda s, b, k: fcgf_eval_loss(
            model, s, b, vs, cfg.backbone.conv1_kernel_size, k,
            pos_margin=args.pos_margin, neg_margin=args.neg_margin,
        )
    )

    # fixed held-out val batches for best-checkpoint selection (deterministic
    # sampling rng so every validation pass scores the same positives)
    n_val = min(8, len(val_pair_list))
    val_idx = np.random.default_rng(7).choice(
        len(val_pair_list), size=n_val, replace=False
    ) if n_val else []
    val_batches = []
    for i in val_idx:
        ds, (a, b) = val_pair_list[int(i)]
        vb = make_fcgf_batch(
            get_cloud(ds, a), get_cloud(ds, b), vs, pad, n_pos=args.n_pos,
            rng=np.random.default_rng(7 + int(i)),
        )
        val_batches.append({k: jnp.asarray(v) for k, v in vb.items()})

    def val_loss(s):
        if not val_batches:
            return float("nan")
        losses = [
            float(eval_fn(s, vb, jax.random.PRNGKey(11 + i))[0])
            for i, vb in enumerate(val_batches)
        ]
        return float(np.mean(losses))

    # Matching-probe selector (default): mutual-NN inlier fraction on
    # held-out ALIGNED pairs — the ground-truth signal. Round 4 measured
    # that the held-out contrastive loss is only a weak selector (its
    # neg term penalizes feature-space sharpening that does not hurt
    # matching; docs/FCGF_TRAINING.md). Stored "best" is negated so that
    # lower-is-better holds for both selectors in the checkpoint file.
    from yoho_tpu.train.probe import probe_inlier_fractions

    probe_pair_clouds = []
    if args.select == "probe":
        pr = np.random.default_rng(7)
        idx = pr.choice(
            len(val_pair_list),
            size=min(args.probe_pairs, len(val_pair_list)),
            replace=False,
        ) if val_pair_list else []
        for i in idx:
            ds, (a, b) = val_pair_list[int(i)]
            pcs = []
            for pc_id in (a, b):
                reps = get_cloud(ds, pc_id)
                p = np.zeros((pad, 3), np.float32)
                n = min(len(reps), pad)
                p[:n] = reps[:n]
                pcs.append((jnp.asarray(p), n))
            probe_pair_clouds.append(tuple(pcs))
        if not probe_pair_clouds:
            print("WARNING: no val pairs for the probe; selecting on val_loss")
            args.select = "val_loss"

    @jax.jit
    def probe_featurize(variables, points, n):
        from yoho_tpu.models.plan import build_unet_plan as _bup
        from yoho_tpu.ops.voxel import build_grid as _bg

        grid, first = _bg(points, vs, n)
        plan = _bup(grid, cfg.backbone.conv1_kernel_size)
        f = model.apply(variables, jnp.ones((pad, 1), jnp.float32), plan, False)
        return f, points[first], plan.mask1

    def probe_score(s):
        variables = {"params": s.params, "batch_stats": s.batch_stats}
        fr = probe_inlier_fractions(
            lambda p, n: tuple(
                np.asarray(x) for x in probe_featurize(variables, p, n)
            ),
            probe_pair_clouds,
            inlier_dist=args.probe_inlier_dist,
        )
        return float(np.mean(fr))

    def selector_value(s):
        """Current selector value (lower is better) + a display string."""
        if args.select == "probe":
            frac = probe_score(s)
            loss = val_loss(s)
            return -frac, f"probe_inlier {frac:.4f} (val_loss {loss:.4f})"
        cur = val_loss(s)
        if np.isnan(cur):  # no val scenes: fall back to train-loss proxy
            cur = float(np.mean(running[-100:])) if running else 1e9
        return cur, f"val_loss {cur:.4f}"

    # async host pipeline: batch i+1 is mined/padded on a background
    # thread while the device runs step i (reference analog: 16
    # dataloader workers, parses_partI.py:52-53). One worker: the
    # numpy rng + cloud cache in sample_batch are not thread-safe.
    import itertools

    from yoho_tpu.utils.prefetch import prefetch

    batch_iter = prefetch(make_step_batch, itertools.count(), depth=2, workers=1)

    # Host-side step mirror + deferred loss readback: int(state.step) /
    # float(loss) every iteration would block the host on each device
    # step, serializing host batch prep with device compute (VERDICT r3
    # weak #5). Losses stay device arrays until the log boundary.
    running = []
    step = int(state.step)
    t0 = time.time()
    while step < args.steps:
        if args.max_seconds and time.time() - t0 > args.max_seconds:
            print(f"wall-clock cap {args.max_seconds}s reached at step {step}")
            break
        _, b = next(batch_iter)
        state, metrics = step_fn(
            state,
            {k: jnp.asarray(v) for k, v in b.items()},
            jax.random.PRNGKey(step),
        )
        running.append(metrics["loss"])
        step += 1
        if step % 100 == 0:
            loss100 = float(np.mean([float(x) for x in running[-100:]]))
            print(
                f"step {step} loss {loss100:.4f} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
            running = running[-100:]
        if step % args.save_interval == 0:
            save_checkpoint(ckpt, state, best)
        if step % args.val_interval == 0:
            cur, disp = selector_value(state)
            print(f"step {step} {disp} (best {best:.4f})", flush=True)
            if cur < best:
                best = cur
                save_checkpoint(best_fn, state, best)
    print(f"host-prep wait total {batch_iter.wait_s:.1f}s (device idle on input)")
    save_checkpoint(ckpt, state, best)
    # Final validation: a wall-clock cap can fire mid-interval, and
    # without this the last val_interval-1 steps of training are never
    # candidates for model_best (a 3,398-step run once shipped its
    # step-2000 checkpoint).
    if int(state.step) % args.val_interval != 0:
        cur, disp = selector_value(state)
        print(f"final {disp} (best {best:.4f})", flush=True)
        if cur < best:
            best = cur
            save_checkpoint(best_fn, state, best)
    if not os.path.exists(best_fn):
        save_checkpoint(best_fn, state, best)


if __name__ == "__main__":
    sys.exit(main())
