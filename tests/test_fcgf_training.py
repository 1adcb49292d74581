"""FCGF backbone training: loss semantics + a step that learns."""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run via -m slow

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from yoho_tpu.config import default_config
from yoho_tpu.data.fcgf_pairs import make_fcgf_batch, mine_positive_pairs
from yoho_tpu.models.fcgf import SparseResUNet
from yoho_tpu.train.fcgf import fcgf_train_step, hardest_contrastive_loss
from yoho_tpu.train.steps import init_train_state
import optax


def test_mine_positive_pairs(rng):
    pc0 = rng.uniform(-1, 1, size=(500, 3))
    pc1 = pc0 + rng.normal(scale=0.005, size=(500, 3))
    pairs = mine_positive_pairs(pc0, pc1, 0.02, 128, rng)
    assert len(pairs) == 128
    d = np.linalg.norm(pc0[pairs[:, 0]] - pc1[pairs[:, 1]], axis=1)
    assert (d < 0.02).all()


def test_hardest_contrastive_loss_separates(rng):
    """identical features at positives + random elsewhere: pos loss ~ 0;
    all-equal features: neg loss maximal."""
    n, c = 64, 8
    f = rng.normal(size=(n, c)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    # clouds occupy the SAME positions: the true correspondence (equal
    # feature) sits within the exclusion radius and must NOT be mined
    # as its own hardest negative.
    xyz0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    xyz1 = xyz0.copy()
    pos = np.stack([np.arange(16), np.arange(16)], 1).astype(np.int32)
    mask = np.ones(n, bool)
    pmask = np.ones(16, bool)
    loss, aux = hardest_contrastive_loss(
        jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask), jnp.asarray(mask),
        jnp.asarray(xyz0), jnp.asarray(xyz1), jnp.asarray(pos), jnp.asarray(pmask),
        key=jax.random.PRNGKey(0),
    )
    assert float(aux["pos_loss"]) < 1e-8
    assert 0 < float(aux["neg_loss"]) < 1.95  # duplicates excluded spatially

    f_const = np.ones((n, c), np.float32) / np.sqrt(c)
    loss2, aux2 = hardest_contrastive_loss(
        jnp.asarray(f_const), jnp.asarray(f_const), jnp.asarray(mask),
        jnp.asarray(mask), jnp.asarray(xyz0), jnp.asarray(xyz1),
        jnp.asarray(pos), jnp.asarray(pmask), key=jax.random.PRNGKey(0),
    )
    # collapsed features: every negative at distance 0 -> max margin loss
    assert abs(float(aux2["neg_loss"]) - 1.4**2) < 1e-5
    assert float(aux2["neg_loss"]) > float(aux["neg_loss"])


def test_fcgf_train_step_learns(rng):
    cfg = default_config()
    bcfg = dataclasses.replace(cfg.backbone, conv1_kernel_size=3, voxel_size=0.05)
    model = SparseResUNet(bcfg)
    pad = 2048
    cloud = rng.uniform(-0.6, 0.6, size=(1500, 3)).astype(np.float32)
    batch_np = make_fcgf_batch(cloud, cloud.copy(), 0.05, pad, n_pos=128, rng=rng)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid

    g0, _ = jax.jit(lambda p: build_grid(p, 0.05, 1500))(batch["points0"])
    plan0 = jax.jit(lambda g: build_unet_plan(g, 3))(g0)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((pad, 1), jnp.float32), plan0, False
    )
    opt = optax.adam(1e-3)
    state = init_train_state(variables, opt)
    step = jax.jit(
        lambda s, b, k: fcgf_train_step(model, opt, s, b, 0.05, 3, k)
    )
    losses = []
    for i in range(8):
        b = make_fcgf_batch(cloud, cloud.copy(), 0.05, pad, n_pos=128, rng=rng)
        state, metrics = step(
            state, {k: jnp.asarray(v) for k, v in b.items()}, jax.random.PRNGKey(i)
        )
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_fcgf_batched_step_equals_mean_grads(rng):
    """fcgf_train_step_batched(B pairs) == one update from the mean of
    the per-pair gradients (the same contract the DP step satisfies,
    tests/test_sharded.py::test_fcgf_train_step_dp_equals_mean_grads)."""
    import optax

    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid
    from yoho_tpu.train.fcgf import fcgf_grads, fcgf_train_step_batched
    from yoho_tpu.train.steps import TrainState

    cfg = default_config()
    bcfg = dataclasses.replace(cfg.backbone, conv1_kernel_size=3, voxel_size=0.1)
    model = SparseResUNet(bcfg)
    pad, B = 256, 3
    pts = jnp.zeros((pad, 3), jnp.float32)
    g0, _ = jax.jit(lambda p: build_grid(p, 0.1, 10))(pts)
    plan0 = jax.jit(lambda g: build_unet_plan(g, 3))(g0)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((pad, 1), jnp.float32), plan0, False
    )
    opt = optax.sgd(1e-2)  # linear in grad: tight comparison (see DP test)
    state = init_train_state(variables, opt)

    singles = []
    for _ in range(B):
        cloud = rng.uniform(-0.6, 0.6, size=(200, 3)).astype(np.float32)
        singles.append(
            make_fcgf_batch(cloud, cloud.copy(), 0.1, pad, n_pos=64, rng=rng)
        )
    batch = {
        k: jnp.asarray(np.stack([s[k] for s in singles])) for k in singles[0]
    }
    key = jax.random.PRNGKey(5)
    new_state, metrics = jax.jit(
        lambda s, b, k: fcgf_train_step_batched(
            model, opt, s, b, 0.1, 3, k, neg_margin=0.7
        )
    )(state, batch, key)

    keys = jax.random.split(key, B)
    grads_all, stats_all, mets = [], [], []
    for i in range(B):
        g, st, m = fcgf_grads(
            model, state, {k: jnp.asarray(v) for k, v in singles[i].items()},
            0.1, 3, keys[i], neg_margin=0.7,
        )
        grads_all.append(g)
        stats_all.append(st)
        mets.append(m)
    gmean = jax.tree.map(lambda *x: jnp.mean(jnp.stack(x), 0), *grads_all)
    smean = jax.tree.map(lambda *x: jnp.mean(jnp.stack(x), 0), *stats_all)
    updates, _ = opt.update(gmean, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)

    for a, b2 in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(ref_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=1e-6)
    for a, b2 in zip(
        jax.tree.leaves(new_state.batch_stats), jax.tree.leaves(smean)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=1e-5)
    ref_loss = float(np.mean([float(m["loss"]) for m in mets]))
    assert abs(float(metrics["loss"]) - ref_loss) < 1e-5
    assert int(new_state.step) == 1
