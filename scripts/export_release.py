"""Export slim, committable release checkpoints.

Training checkpoints (``model/*/model_best.pkl``) carry Adam moments —
3x the parameter payload — and ``model/`` is gitignored, which is how
round 2's trained FCGF was lost between rounds. This script rewrites
each best checkpoint with zeroed optimizer state and gzip compression
into ``model_release/`` (same layout, loadable by every consumer via
``load_checkpoint``'s magic-byte sniffing; resuming *training* from a
release checkpoint restarts the optimizer, which is the documented
trade).

Usage: python scripts/export_release.py [--model-dir ./model]
         [--out-dir ./model_release]
"""

from __future__ import annotations

import argparse
import gzip
import os
import pickle
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="./model")
    ap.add_argument("--out-dir", default="./model_release")
    ap.add_argument(
        "--dtype",
        default="float16",
        choices=["float16", "float32"],
        help="storage dtype for params/batch_stats (float16 halves the "
        "committed size; loaders cast back to the template precision — "
        "round-3 advisor finding on per-round git growth)",
    )
    args = ap.parse_args()

    # Checkpoint storage policy (round-5, advisor item): the ONLY weight
    # blobs tracked in git are the float16, optimizer-stripped release
    # checkpoints this script writes (plus their provenance sidecars and
    # the MANIFEST.json below). Full float32 training checkpoints live
    # in the gitignored model/ tree and must never be committed — two
    # 105 MB f32 A/B checkpoints once pushed .git close to 1 GB.

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    import optax
    from flax import serialization

    from yoho_tpu.config import default_config
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.part1 import PartINetwork
    from yoho_tpu.models.part2 import PartIINetwork
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.train.steps import init_train_state
    from yoho_tpu.train.trainer import load_checkpoint

    cfg = default_config()

    def fcgf_template():
        model = SparseResUNet(cfg.backbone)
        pts = jnp.zeros((256, 3), jnp.float32)
        grid, _ = jax.jit(lambda p: build_grid(p, cfg.backbone.voxel_size, 10))(pts)
        plan = jax.jit(
            lambda g: build_unet_plan(g, cfg.backbone.conv1_kernel_size)
        )(grid)
        return model.init(
            jax.random.PRNGKey(0), jnp.ones((256, 1), jnp.float32), plan, False
        )

    def part1_template():
        return PartINetwork(cfg.part1).init(
            jax.random.PRNGKey(0), jnp.zeros((8, 60, 32), jnp.float32), False
        )

    def part2_template():
        f = jnp.zeros((8, 60, 32), jnp.float32)
        return PartIINetwork(cfg.part2).init(
            jax.random.PRNGKey(0), f, f, f, f, jnp.zeros(8, jnp.int32), False
        )

    parts = {
        "Backbone": fcgf_template,
        "PartI": part1_template,
        "PartII": part2_template,
    }
    manifest = {}
    for name, make_template in parts.items():
        src = os.path.join(args.model_dir, name, "model_best.pkl")
        if not os.path.exists(src):
            print(f"skip {name}: no {src}")
            continue
        # trainers use optax.adam(<callable schedule>), whose opt_state
        # carries a ScaleByScheduleState — match that structure
        template = init_train_state(
            make_template(), optax.adam(optax.constant_schedule(1e-4))
        )
        state, best = load_checkpoint(src, template)
        store_dt = jnp.dtype(args.dtype)

        def shrink(x):
            return x.astype(store_dt) if jnp.issubdtype(x.dtype, jnp.floating) else x

        # opt_state keeps its pytree structure (zeros gzip to ~nothing),
        # so strict from_bytes loads still work; loaders cast the f16
        # params back to the template dtype (trainer._cast_like).
        slim = state._replace(
            params=jax.tree.map(shrink, state.params),
            batch_stats=jax.tree.map(shrink, state.batch_stats),
            opt_state=jax.tree.map(jnp.zeros_like, state.opt_state),
        )
        payload = {
            "state": serialization.to_bytes(slim),
            "best_para": best,
            "step": int(state.step),
        }
        dst_dir = os.path.join(args.out_dir, name)
        os.makedirs(dst_dir, exist_ok=True)
        dst = os.path.join(dst_dir, "model_best.pkl")
        with gzip.open(dst, "wb", compresslevel=6) as f:
            pickle.dump(payload, f)
        print(
            f"{name}: {os.path.getsize(src)/1e6:.1f} MB -> "
            f"{os.path.getsize(dst)/1e6:.1f} MB (step {int(state.step)}, "
            f"best {best})"
        )
        # Provenance sidecar: PartI/PartII are functions of the backbone
        # they were trained on. Record fingerprints of both the live and
        # the released backbone files so run_synth_ladder's bootstrap
        # can refuse to resurrect them against a different backbone.
        if name != "Backbone":
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "_ladder",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "run_synth_ladder.py"),
            )
            _ladder = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(_ladder)
            fingerprint = _ladder.fingerprint

            fps = []
            for bb in (
                os.path.join(args.model_dir, "Backbone", "model_best.pkl"),
                os.path.join(args.out_dir, "Backbone", "model_best.pkl"),
            ):
                if os.path.exists(bb):
                    fps.append(fingerprint([bb]))
            with open(os.path.join(dst_dir, ".backbone_fp"), "w") as f:
                f.write("\n".join(fps))
        import hashlib

        with open(dst, "rb") as f:
            sha = hashlib.sha256(f.read()).hexdigest()
        manifest[name] = {
            "path": os.path.relpath(dst, args.out_dir),
            "sha256": sha,
            "step": int(state.step),
            "best": float(best) if best is not None else None,
            "dtype": args.dtype,
        }
    if manifest:
        import json

        mfn = os.path.join(args.out_dir, "MANIFEST.json")
        with open(mfn, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        print(f"wrote {mfn}")


if __name__ == "__main__":
    sys.exit(main())
