"""Train PartI or PartII (reference ``Train.py``).

Usage:
  python scripts/train.py --part PartI  [--data-dir ./data/YOHO_TPU]
  python scripts/train.py --part PartII [--part1-ckpt model/PartI/model_best.pkl]

Expects baked batches from ``scripts/trainset_gen.py`` under
``{data_dir}/Train_val_list/{trainset,valset}``.

PartII batches are derived from PartI outputs on the fly: the frozen
best PartI checkpoint maps the baked FCGF group features to equivariant
descriptors (reference Trainer_partII loads PartI under the
``PartI_net.`` prefix, ``train/trainer.py:163-168``; here the freeze is
structural — PartII simply never sees PartI's parameters).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["PartI", "PartII"], default="PartI")
    ap.add_argument("--data-dir", default="./data/YOHO_TPU")
    ap.add_argument("--model-dir", default="./model")
    ap.add_argument("--part1-ckpt", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument(
        "--no-augment",
        action="store_true",
        help="disable on-the-fly group augmentation (exact reference behavior)",
    )
    ap.add_argument("--weight-decay", type=float, default=1e-4)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    import dataclasses

    import jax.numpy as jnp

    from yoho_tpu.config import default_config
    from yoho_tpu.data.trainset import augment_group_batch, batch_iterator
    from yoho_tpu.group import get_group
    from yoho_tpu.models.part1 import PartINetwork, des2dr
    from yoho_tpu.models.part2 import PartIINetwork
    from yoho_tpu.train.trainer import TrainerPartI, TrainerPartII, load_checkpoint

    cfg = default_config()
    if args.epochs:
        cfg.train = dataclasses.replace(cfg.train, epochs=args.epochs)
    if args.weight_decay:
        cfg.train = dataclasses.replace(cfg.train, weight_decay=args.weight_decay)

    # Group augmentation (train batches only): composes random group
    # elements onto both sides of each baked sample, multiplying the
    # effective 60-way rotation labels x3600 for free — the fix for the
    # measured rotation-head overfit (see data/trainset.py
    # ``augment_group_batch``). Validation stays unaugmented.
    G = get_group()
    aug_rng = np.random.default_rng(cfg.train.seed + 17)
    if args.no_augment:
        augment = lambda b: b
    else:
        augment = lambda b: augment_group_batch(b, aug_rng, G)

    train_dir = os.path.join(args.data_dir, "Train_val_list", "trainset")
    val_dir = os.path.join(args.data_dir, "Train_val_list", "valset")
    n_train = len([f for f in os.listdir(train_dir) if f.endswith(".npz")])
    print(f"{n_train} train batches")

    def to_device(b):
        return {k: jnp.asarray(v) for k, v in b.items()}

    if args.part == "PartI":
        cfg.train = dataclasses.replace(cfg.train, lr_init=1e-4, lr_decay_step=1.6)
        model = PartINetwork(cfg.part1)
        example = to_device(next(batch_iterator(train_dir, shuffle=False)))
        trainer = TrainerPartI(
            cfg, model, os.path.join(args.model_dir, "PartI"), example
        )
        trainer.fit(
            lambda: (to_device(augment(b)) for b in batch_iterator(train_dir)),
            lambda: (to_device(b) for b in batch_iterator(val_dir, shuffle=False)),
            steps_per_epoch=n_train,
        )
        return

    # ---- PartII: frozen PartI front-end ----
    cfg.train = dataclasses.replace(cfg.train, lr_init=1e-3, lr_decay_step=1.5)
    p1_ckpt = args.part1_ckpt or os.path.join(args.model_dir, "PartI", "model_best.pkl")
    part1 = PartINetwork(cfg.part1)
    example_raw = next(batch_iterator(train_dir, shuffle=False))
    from yoho_tpu.train.steps import init_train_state, make_optimizer

    v0 = part1.init(jax.random.PRNGKey(0), jnp.asarray(example_raw["feats0"]), False)
    template = init_train_state(v0, make_optimizer(cfg.train, 1))
    p1_state, _ = load_checkpoint(p1_ckpt, template)
    p1_vars = {"params": p1_state.params, "batch_stats": p1_state.batch_stats}

    @jax.jit
    def part1_fwd(feats):
        return part1.apply(p1_vars, feats, False)["eqv"]

    def enrich(b):
        """Baked PartI batch -> PartII batch with frozen-PartI features,
        aligned by true_idx at train time (reference PartII_train,
        network.py:199-201). No slot swap here: the slot-0 (aligned)
        side is always the *source* of the regressed rotation — pc0 at
        train (R = from pc0 to pc1, YOHO_Trainset.py:186), cloud1 at
        test (hence batch_create's swap, tests/extractor.py:125-138)."""
        f0 = jnp.asarray(b["feats0"])
        f1 = jnp.asarray(b["feats1"])
        e0 = part1_fwd(f0)
        e1 = part1_fwd(f1)
        return {
            "before_eqv0": f0,
            "before_eqv1": f1,
            "after_eqv0": e0,
            "after_eqv1": e1,
            "true_idx": jnp.asarray(b["true_idx"]),
            "delta_q": jnp.asarray(b["delta_q"]),
        }

    model2 = PartIINetwork(cfg.part2)
    example = enrich(example_raw)
    trainer = TrainerPartII(cfg, model2, os.path.join(args.model_dir, "PartII"), example)
    trainer.fit(
        lambda: (enrich(augment(b)) for b in batch_iterator(train_dir)),
        lambda: (enrich(b) for b in batch_iterator(val_dir, shuffle=False)),
        steps_per_epoch=n_train,
    )


if __name__ == "__main__":
    sys.exit(main())
