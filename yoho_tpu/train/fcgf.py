"""FCGF backbone training: hardest-contrastive metric learning.

The reference consumes an externally trained FCGF checkpoint
(``README.md:127``, ``others/Readme.md:55-57``; stripped from the
mirror), so this framework owns the backbone recipe: the FCGF
hardest-contrastive objective (Choy et al., ICCV 2019) on overlapping
fragment pairs with rotation augmentation —

  L = mean_pos [d(f0_i, f1_i) - m_pos]_+^2
    + 0.5 * mean (over both directions) [m_neg - d_hardest_neg]_+^2

with the hardest negative mined over a random subsample of the other
cloud's voxels, excluding spatial neighbors of the anchor.

Defaults follow the public FCGF 3DMatch config: m_pos = 0.1,
m_neg = 1.4 on L2-normalized 32-d features.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from yoho_tpu.train.steps import TrainState


class FcgfBatch(NamedTuple):
    """One fragment pair, padded/static. Built on host
    (``data/fcgf_pairs.py``)."""

    points0: jnp.ndarray  # (N_pad, 3) rotated/augmented
    points1: jnp.ndarray
    n0: jnp.ndarray  # int32 valid counts
    n1: jnp.ndarray
    pos_pairs: jnp.ndarray  # (P, 2) int32 indices into voxel rows (post-plan)
    pos_mask: jnp.ndarray  # (P,)


def hardest_contrastive_loss(
    f0: jnp.ndarray,  # (N, C) voxel features, L2-normalized, pad rows zero
    f1: jnp.ndarray,
    mask0: jnp.ndarray,
    mask1: jnp.ndarray,
    xyz0: jnp.ndarray,  # (N, 3) voxel coordinates (for neighbor exclusion)
    xyz1: jnp.ndarray,
    pos_pairs: jnp.ndarray,  # (P, 2) rows of f0 / f1
    pos_mask: jnp.ndarray,
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
    num_neg_candidates: int = 1024,
    exclusion_radius: float = 0.05,
    key: jax.Array | None = None,
) -> tuple[jnp.ndarray, dict]:
    key = key if key is not None else jax.random.PRNGKey(0)
    a0 = f0[pos_pairs[:, 0]]  # (P, C) anchors in cloud0
    a1 = f1[pos_pairs[:, 1]]
    x0 = xyz0[pos_pairs[:, 0]]
    x1 = xyz1[pos_pairs[:, 1]]
    pm = pos_mask.astype(f0.dtype)
    n_pos = jnp.maximum(pm.sum(), 1.0)

    d_pos = jnp.linalg.norm(a0 - a1 + 1e-12, axis=1)
    pos_loss = jnp.sum(jnp.clip(d_pos - pos_margin, min=0.0) ** 2 * pm) / n_pos

    k0, k1 = jax.random.split(key)

    def hardest(anchors, ax, fb, mb, xb, kk):
        # subsample negative candidates from the other cloud
        nb = fb.shape[0]
        cand = jax.random.randint(kk, (num_neg_candidates,), 0, nb)
        fc = fb[cand]  # (Q, C)
        mc = mb[cand]
        xc = xb[cand]
        d = jnp.linalg.norm(anchors[:, None, :] - fc[None, :, :] + 1e-12, axis=-1)
        too_close = (
            jnp.sum(jnp.square(ax[:, None, :] - xc[None, :, :]), -1)
            < exclusion_radius**2
        )
        d = jnp.where(mc[None, :] & ~too_close, d, jnp.inf)
        d_min = jnp.min(d, axis=1)
        ok = jnp.isfinite(d_min)
        d_min = jnp.where(ok, d_min, neg_margin)
        return jnp.clip(neg_margin - d_min, min=0.0) ** 2

    neg0 = hardest(a0, x0, f1, mask1, xyz1, k0)
    neg1 = hardest(a1, x1, f0, mask0, xyz0, k1)
    neg_loss = 0.5 * (jnp.sum(neg0 * pm) + jnp.sum(neg1 * pm)) / n_pos

    loss = pos_loss + neg_loss
    return loss, {
        "pos_loss": pos_loss,
        "neg_loss": neg_loss,
        "d_pos_mean": jnp.sum(d_pos * pm) / n_pos,
    }


def fcgf_grads(
    model,
    state: TrainState,
    batch: dict,
    voxel_size: float,
    conv1_kernel_size: int,
    key: jax.Array,
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
):
    """Gradients for one fragment pair: voxelize both clouds, run the
    UNet, contrastive loss. Returns (grads, new_batch_stats, metrics) —
    the optimizer update is applied by the caller so the data-parallel
    step (``parallel/sharded.py``) can pmean gradients first.

    batch: points0/points1 (N_pad, 3), n0/n1, pos_pairs (P, 2) indices
    into the *point rows* (mapped to voxel rows via first_index inverse
    on device), pos_mask.
    """
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.kernel_map import search_keys
    from yoho_tpu.ops.voxel import SENTINEL, build_grid, pack_keys, quantize

    def featurize(params_stats, points, n):
        variables = {"params": params_stats[0], "batch_stats": params_stats[1]}
        grid, first = build_grid(points, voxel_size, n)
        plan = build_unet_plan(grid, conv1_kernel_size)
        feats_in = jnp.ones((points.shape[0], 1), points.dtype)
        out, mutated = model.apply(
            variables, feats_in, plan, True, mutable=["batch_stats"]
        )
        return out, mutated["batch_stats"], grid, first, plan

    def point_rows_to_voxel_rows(grid, points, n, rows):
        """Map point indices to their voxel's row in the sorted grid."""
        coords, valid = quantize(points, voxel_size, n)
        q = coords[rows]
        q_hi, q_lo = pack_keys(q)
        idx, found = search_keys(grid, q_hi, q_lo)
        return idx, found

    def loss_fn(params):
        f0, stats0, g0, first0, p0 = featurize(
            (params, state.batch_stats), batch["points0"], batch["n0"]
        )
        f1, stats1, g1, first1, p1 = featurize(
            (params, stats0), batch["points1"], batch["n1"]
        )
        r0, ok0 = point_rows_to_voxel_rows(
            g0, batch["points0"], batch["n0"], batch["pos_pairs"][:, 0]
        )
        r1, ok1 = point_rows_to_voxel_rows(
            g1, batch["points1"], batch["n1"], batch["pos_pairs"][:, 1]
        )
        pos = jnp.stack([r0, r1], axis=1)
        pmask = batch["pos_mask"] & ok0 & ok1
        # per-voxel-row positions = representative raw points
        vox_xyz0 = batch["points0"][first0]
        vox_xyz1 = batch["points1"][first1]
        loss, aux = hardest_contrastive_loss(
            f0, f1, p0.mask1, p1.mask1, vox_xyz0, vox_xyz1, pos, pmask,
            pos_margin=pos_margin, neg_margin=neg_margin, key=key,
        )
        return loss, (aux, stats1)

    (loss, (aux, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    return grads, new_stats, {"loss": loss, **aux}


def fcgf_eval_loss(
    model,
    state: TrainState,
    batch: dict,
    voxel_size: float,
    conv1_kernel_size: int,
    key: jax.Array,
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
):
    """Held-out validation loss for one fragment pair: same objective as
    ``fcgf_grads`` but eval-mode (no grads, batch_stats frozen). Used by
    ``scripts/train_fcgf.py`` for best-checkpoint selection."""
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.kernel_map import search_keys
    from yoho_tpu.ops.voxel import build_grid, pack_keys, quantize

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def featurize(points, n):
        grid, first = build_grid(points, voxel_size, n)
        plan = build_unet_plan(grid, conv1_kernel_size)
        feats_in = jnp.ones((points.shape[0], 1), points.dtype)
        out = model.apply(variables, feats_in, plan, False)
        return out, grid, first, plan

    def point_rows_to_voxel_rows(grid, points, n, rows):
        coords, _ = quantize(points, voxel_size, n)
        q_hi, q_lo = pack_keys(coords[rows])
        return search_keys(grid, q_hi, q_lo)

    f0, g0, first0, p0 = featurize(batch["points0"], batch["n0"])
    f1, g1, first1, p1 = featurize(batch["points1"], batch["n1"])
    r0, ok0 = point_rows_to_voxel_rows(
        g0, batch["points0"], batch["n0"], batch["pos_pairs"][:, 0]
    )
    r1, ok1 = point_rows_to_voxel_rows(
        g1, batch["points1"], batch["n1"], batch["pos_pairs"][:, 1]
    )
    pos = jnp.stack([r0, r1], axis=1)
    pmask = batch["pos_mask"] & ok0 & ok1
    loss, aux = hardest_contrastive_loss(
        f0,
        f1,
        p0.mask1,
        p1.mask1,
        batch["points0"][first0],
        batch["points1"][first1],
        pos,
        pmask,
        pos_margin=pos_margin,
        neg_margin=neg_margin,
        key=key,
    )
    return loss, aux


def fcgf_train_step(
    model,
    optimizer,
    state: TrainState,
    batch: dict,
    voxel_size: float,
    conv1_kernel_size: int,
    key: jax.Array,
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
):
    """Single-device step: grads + Adam update (see ``fcgf_grads``).

    Margin geometry note (docs/FCGF_TRAINING.md): the FCGF-published
    m_neg=1.4 lives in an UNNORMALIZED feature space; on L2-normalized
    32-d features (max distance 2.0) it demands near-anticorrelated
    hardest negatives and was measured to collapse the feature space.
    Pass sphere-scaled margins (e.g. neg 0.7) for normalized training.
    """
    grads, new_stats, metrics = fcgf_grads(
        model, state, batch, voxel_size, conv1_kernel_size, key,
        pos_margin=pos_margin, neg_margin=neg_margin,
    )
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics


def fcgf_train_step_batched(
    model,
    optimizer,
    state: TrainState,
    batch: dict,
    voxel_size: float,
    conv1_kernel_size: int,
    key: jax.Array,
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
):
    """Single-device step over a STACK of fragment pairs.

    batch leaves carry a leading batch axis B (``points0``: (B, N_pad, 3)
    etc., as built by stacking ``make_fcgf_batch`` outputs). Per-pair
    gradients/batch-stats/metrics are computed as vmap lanes of one
    dispatch and averaged before a single optimizer update — the
    reference FCGF recipe trains with batch 4 pairs per step
    (``/root/reference/README.md:127``; round-4 analysis: 1-pair steps
    make hardest-negative mining noisy). Equivalent to the mean of
    per-pair ``fcgf_grads`` (tested in ``tests/test_fcgf_training.py``),
    and to the data-parallel step with B devices
    (``parallel/sharded.py:make_fcgf_train_step_dp``) on one chip.
    """
    import os

    n_pairs = batch["n0"].shape[0]
    keys = jax.random.split(key, n_pairs)

    def per_pair(b, k):
        return fcgf_grads(
            model, state, b, voxel_size, conv1_kernel_size, k,
            pos_margin=pos_margin, neg_margin=neg_margin,
        )

    # 'map' (default) runs the pairs sequentially inside the one jitted
    # step: vmapping the whole grads fn batches every conv gather, and
    # batched gathers run ~4x slower than flat ones on this backend
    # (pipeline/lifting.py measured the same effect; map-mode steps are
    # ~1.6x faster at batch 4). 'vmap' kept for A/B.
    mode = os.environ.get("YOHO_FCGF_BATCH_MODE", "map")
    if mode == "vmap":
        grads, new_stats, metrics = jax.vmap(per_pair)(batch, keys)
    else:
        grads, new_stats, metrics = jax.lax.map(
            lambda bk: per_pair(*bk), (batch, keys)
        )
    grads = jax.tree.map(lambda x: x.mean(0), grads)
    new_stats = jax.tree.map(lambda x: x.mean(0), new_stats)
    metrics = jax.tree.map(lambda x: x.mean(0), metrics)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics
