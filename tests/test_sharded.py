"""Device-sharded stages == single-device results (8 virtual CPU devices).

Every factory in ``yoho_tpu/parallel/sharded.py`` is checked for
numerical equality against its single-device counterpart on the
conftest's 8-device virtual CPU mesh — the in-repo proof that the
multi-chip sharding is not just code (reference analog it replaces:
manual scene splitting + torch DDP examples,
``/root/reference/MinkowskiEngine/examples/multigpu_ddp.py:82-91``).
"""

import pytest

pytestmark = pytest.mark.slow  # heavy tier: run via -m slow

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
import optax

from yoho_tpu.config import default_config
from yoho_tpu.data.fcgf_pairs import make_fcgf_batch
from yoho_tpu.models.fcgf import SparseResUNet
from yoho_tpu.models.plan import build_unet_plan
from yoho_tpu.ops.voxel import build_grid
from yoho_tpu.parallel.mesh import make_mesh
from yoho_tpu.parallel.sharded import (
    make_fcgf_train_step_dp,
    make_sharded_lift,
    make_sharded_match,
    make_sharded_ransac_c,
    make_sharded_ransac_o,
)
from yoho_tpu.pipeline.lifting import lift_group_features
from yoho_tpu.pipeline.matching import mutual_match
from yoho_tpu.pipeline.ransac import yoho_c_ransac, yoho_o_ransac
from yoho_tpu.train.fcgf import fcgf_grads
from yoho_tpu.train.steps import TrainState, init_train_state


def _small_fcgf(pad, voxel_size=0.1, k1=3):
    cfg = default_config()
    bcfg = dataclasses.replace(
        cfg.backbone, conv1_kernel_size=k1, voxel_size=voxel_size
    )
    model = SparseResUNet(bcfg)
    pts = jnp.zeros((pad, 3), jnp.float32)
    g0, _ = jax.jit(lambda p: build_grid(p, voxel_size, 10))(pts)
    plan0 = jax.jit(lambda g: build_unet_plan(g, k1))(g0)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((pad, 1), jnp.float32), plan0, False
    )
    return model, variables, bcfg


def test_sharded_lift_matches_single_device(rng):
    pad, kn, B = 256, 32, 4
    model, variables, bcfg = _small_fcgf(pad)
    mesh = make_mesh(4, 2)  # clouds over data=4, rotations over group=2

    def apply_fn(v, feats, plan):
        return model.apply(v, feats, plan, False)

    lift_batch = make_sharded_lift(
        mesh, apply_fn, bcfg.voxel_size, bcfg.conv1_kernel_size,
        rotations_per_batch=5,
    )
    points = np.zeros((B, pad, 3), np.float32)
    n_valid = np.zeros((B,), np.int32)
    keys = np.zeros((B, kn, 3), np.float32)
    for i in range(B):
        n = int(rng.integers(150, 220))
        points[i, :n] = rng.uniform(-0.6, 0.6, (n, 3))
        n_valid[i] = n
        keys[i] = points[i, rng.choice(n, kn, replace=False)]

    with mesh:
        out = np.asarray(
            lift_batch(
                variables, jnp.asarray(points), jnp.asarray(n_valid),
                jnp.asarray(keys),
            )
        )
    assert out.shape == (B, kn, 60, 32)

    for i in range(B):
        ref = np.asarray(
            lift_group_features(
                apply_fn, variables, jnp.asarray(points[i]),
                jnp.asarray(n_valid[i]), jnp.asarray(keys[i]),
                bcfg.voxel_size, bcfg.conv1_kernel_size, rotations_per_batch=5,
            )
        )
        np.testing.assert_allclose(out[i], ref, atol=1e-5)


def test_sharded_match_exact(rng):
    mesh = make_mesh(4, 2)
    kn = 64  # divisible by the 8 devices
    inv0 = jnp.asarray(rng.normal(size=(kn, 32)).astype(np.float32))
    inv1 = jnp.asarray(rng.normal(size=(kn, 32)).astype(np.float32))
    match = make_sharded_match(mesh)
    with mesh:
        got = match(inv0, inv1)
    ref = mutual_match(inv0, inv1)
    assert int(got.count) == int(ref.count)
    np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
    np.testing.assert_array_equal(np.asarray(got.pairs), np.asarray(ref.pairs))


def _ransac_inputs(rng, B=8, kn=48, m=48):
    keys0 = rng.uniform(-1, 1, (B, kn, 3)).astype(np.float32)
    keys1 = np.empty_like(keys0)
    for i in range(B):
        # random rigid motion; keys1 = R^-1 (keys0 - t) so R@k1+t=k0
        a = rng.normal(size=3)
        a /= np.linalg.norm(a)
        th = rng.uniform(0.1, 2.0)
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        t = rng.uniform(-0.3, 0.3, 3)
        keys1[i] = (keys0[i] - t) @ R  # (R.T applied on the right)
    pairs = np.tile(np.stack([np.arange(m), np.arange(m)], 1), (B, 1, 1))
    mask = np.ones((B, m), bool)
    # concentrate votes in a few bins so the distribution is non-degenerate
    dr = rng.integers(0, 4, (B, m)).astype(np.int32)
    return (
        jnp.asarray(keys0), jnp.asarray(keys1),
        jnp.asarray(pairs.astype(np.int32)), jnp.asarray(mask), jnp.asarray(dr),
    )


def test_sharded_ransac_c_matches_vmap(rng):
    mesh = make_mesh(4, 2)
    keys0, keys1, pairs, mask, dr = _ransac_inputs(rng)
    rkeys = jax.random.split(jax.random.PRNGKey(3), 8)
    run = make_sharded_ransac_c(mesh, max_iter=64, inlier_dist=0.07)
    with mesh:
        got = run(rkeys, keys0, keys1, pairs, mask, dr)
    ref = jax.vmap(
        functools.partial(yoho_c_ransac, max_iter=64, inlier_dist=0.07)
    )(rkeys, keys0, keys1, pairs, mask, dr)
    np.testing.assert_allclose(
        np.asarray(got.transform), np.asarray(ref.transform), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.overlap), np.asarray(ref.overlap), atol=1e-6
    )
    # perfect correspondences: every pair should register
    assert (np.asarray(ref.overlap) > 0.9).all()


def test_sharded_ransac_o_matches_vmap(rng):
    mesh = make_mesh(4, 2)
    keys0, keys1, pairs, mask, _ = _ransac_inputs(rng)
    # per-correspondence hypotheses: exact Kabsch on random triplets
    from yoho_tpu.pipeline.ransac import kabsch_3pt

    m = pairs.shape[1]
    tri = jnp.asarray(rng.integers(0, m, (8, m, 3)).astype(np.int32))
    k0m = jnp.take_along_axis(keys0[:, :, None, :], tri[..., None], axis=1)
    transforms = jax.vmap(
        lambda a, b, t: kabsch_3pt(a[t], b[t])
    )(keys0, keys1, tri)
    run = make_sharded_ransac_o(mesh, inlier_dist=0.09)
    del k0m
    with mesh:
        got = run(keys0, keys1, pairs, mask, transforms)
    ref = jax.vmap(functools.partial(yoho_o_ransac, inlier_dist=0.09))(
        keys0, keys1, pairs, mask, transforms
    )
    np.testing.assert_allclose(
        np.asarray(got.transform), np.asarray(ref.transform), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.overlap), np.asarray(ref.overlap), atol=1e-6
    )


def test_fcgf_train_step_dp_equals_mean_grads(rng):
    pad = 256
    model, variables, bcfg = _small_fcgf(pad)
    mesh = make_mesh(8, 1)
    # SGD, not Adam: the update is linear in the gradient, so the
    # pmean-vs-host-mean comparison is tight (Adam's g/sqrt(v) amplifies
    # reassociation noise without bound on near-zero gradients)
    opt = optax.sgd(1e-2)
    state = init_train_state(variables, opt)

    cloud = rng.uniform(-0.6, 0.6, size=(200, 3)).astype(np.float32)
    b = make_fcgf_batch(cloud, cloud.copy(), bcfg.voxel_size, pad,
                        n_pos=64, rng=rng)
    # identical pair on every device: DP result must equal the update
    # from the mean of the 8 per-device-key gradients
    batch = {k: jnp.asarray(np.stack([v] * 8)) for k, v in b.items()}
    key = jax.random.PRNGKey(5)

    dp_step = make_fcgf_train_step_dp(
        mesh, model, opt, bcfg.voxel_size, bcfg.conv1_kernel_size
    )
    with mesh:
        new_state, metrics = dp_step(state, batch, key)

    keys = jax.random.split(key, 8)
    single = {k: jnp.asarray(v) for k, v in b.items()}
    grads_all, stats, mets = [], None, []
    for i in range(8):
        g, stats, m = fcgf_grads(
            model, state, single, bcfg.voxel_size, bcfg.conv1_kernel_size,
            keys[i],
        )
        grads_all.append(g)
        mets.append(m)
    gmean = jax.tree.map(lambda *x: jnp.mean(jnp.stack(x), 0), *grads_all)
    updates, new_opt = opt.update(gmean, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)
    ref_state = TrainState(ref_params, stats, new_opt, state.step + 1)

    for a, b2 in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=1e-6)
    for a, b2 in zip(
        jax.tree.leaves(new_state.batch_stats), jax.tree.leaves(ref_state.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=1e-5)
    ref_loss = float(np.mean([float(m["loss"]) for m in mets]))
    assert abs(float(metrics["loss"]) - ref_loss) < 1e-5
    assert int(new_state.step) == 1
