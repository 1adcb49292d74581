"""Training-stack tests: loss semantics, a real fit() that learns, and
checkpoint/resume."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.config import default_config
from yoho_tpu.group import get_group
from yoho_tpu.models.part1 import PartINetwork
from yoho_tpu.train.losses import batch_hard_rindex_loss, dr_correlation, smooth_l1_loss
from yoho_tpu.train.steps import init_train_state, make_optimizer, part1_train_step


def _synthetic_batch(rng, G, B=16):
    """feats1 = group-permuted feats0 (+noise): the structure PartI must
    learn to classify."""
    feats0 = rng.normal(size=(B, 60, 32)).astype(np.float32)
    idx = rng.integers(0, 60, B).astype(np.int32)
    feats1 = np.stack([feats0[b][G.cayley[idx[b]]] for b in range(B)])
    feats1 += 0.05 * rng.normal(size=feats1.shape).astype(np.float32)
    return {
        "feats0": jnp.asarray(feats0),
        "feats1": jnp.asarray(feats1.astype(np.float32)),
        "true_idx": jnp.asarray(idx),
    }


def test_dr_correlation_matches_des2dr_argmax(rng):
    from yoho_tpu.models.part1 import des2dr

    G = get_group()
    D = jnp.asarray(rng.normal(size=(8, 60, 16)).astype(np.float32))
    D2 = D[:, G.cayley[11], :]
    cor = dr_correlation(D, D2)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(cor, 1)), np.asarray(des2dr(D, D2)))


def test_smooth_l1():
    p = jnp.asarray([0.5, 2.0])
    t = jnp.asarray([0.0, 0.0])
    # 0.5*0.25 + (2-0.5) = 0.125+1.5
    assert abs(float(smooth_l1_loss(p, t)) - 1.625) < 1e-6


@pytest.mark.slow
def test_part1_training_learns(rng):
    """~60 Adam steps on equivariance-structured data must lift DR
    accuracy well above chance and reduce the loss."""
    G = get_group()
    cfg = default_config()
    model = PartINetwork(cfg.part1)
    batch0 = _synthetic_batch(rng, G)
    variables = model.init(jax.random.PRNGKey(0), batch0["feats0"], False)
    opt = make_optimizer(cfg.train, steps_per_epoch=1000)
    state = init_train_state(variables, opt)
    step = jax.jit(lambda s, b: part1_train_step(model, opt, cfg.train, s, b))

    first_loss = None
    metrics = None
    for i in range(60):
        batch = _synthetic_batch(rng, G)
        state, metrics = step(state, batch)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    assert float(metrics["loss"]) < first_loss
    assert float(metrics["dr_acc"]) > 0.5  # chance = 1/60


@pytest.mark.slow
def test_trainer_fit_and_resume(tmp_path, rng):
    from yoho_tpu.train.trainer import TrainerPartI, load_checkpoint

    G = get_group()
    cfg = default_config()
    import dataclasses

    cfg.train = dataclasses.replace(
        cfg.train, epochs=1, val_interval=5, save_interval=5, train_log_step=5
    )
    model = PartINetwork(cfg.part1)
    batches = [_synthetic_batch(rng, G, B=8) for _ in range(10)]

    def train_it():
        yield from batches

    def val_it():
        yield from batches[:2]

    tr = TrainerPartI(cfg, model, str(tmp_path / "m"), batches[0])
    state, best = tr.fit(train_it, val_it, steps_per_epoch=10)
    assert int(state.step) == 10
    assert (tmp_path / "m" / "model.pkl").exists()
    assert (tmp_path / "m" / "model_best.pkl").exists()

    # resume: raises epochs, continues from step 10
    cfg2 = dataclasses.replace(cfg)
    cfg2.train = dataclasses.replace(cfg.train, epochs=2)
    tr2 = TrainerPartI(cfg2, model, str(tmp_path / "m"), batches[0])
    state2, _ = tr2.fit(train_it, val_it, steps_per_epoch=10)
    assert int(state2.step) == 20


def test_bake_and_iterate_batches(tmp_path, rng):
    from yoho_tpu.data.trainset import batch_iterator

    d = tmp_path / "bk"
    d.mkdir()
    for i in range(3):
        np.savez(d / f"{i}.npz", feats0=np.full((2, 2), i, np.float32))
    seen = sorted(int(b["feats0"][0, 0]) for b in batch_iterator(str(d)))
    assert seen == [0, 1, 2]


@pytest.mark.slow
def test_gzip_release_checkpoint_roundtrip(tmp_path, rng):
    """Release checkpoints (scripts/export_release.py) are gzip pickles
    with zeroed optimizer moments; load_checkpoint must sniff the magic
    bytes and restore identical params/batch_stats."""
    import gzip
    import pickle

    import optax
    from flax import serialization

    from yoho_tpu.train.trainer import load_checkpoint, save_checkpoint

    cfg = default_config()
    model = PartINetwork(cfg.part1)
    feats = jnp.asarray(rng.normal(size=(4, 60, 32)).astype(np.float32))
    v0 = model.init(jax.random.PRNGKey(0), feats, False)
    opt = optax.adam(optax.constant_schedule(1e-4))
    state = init_train_state(v0, opt)
    plain = str(tmp_path / "model_best.pkl")
    save_checkpoint(plain, state, 0.5)

    slim = state._replace(opt_state=jax.tree.map(jnp.zeros_like, state.opt_state))
    gz = str(tmp_path / "release.pkl")
    with gzip.open(gz, "wb") as f:
        pickle.dump(
            {"state": serialization.to_bytes(slim), "best_para": 0.5, "step": 0}, f
        )

    s1, b1 = load_checkpoint(plain, state)
    s2, b2 = load_checkpoint(gz, state)
    assert b1 == b2 == 0.5
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # inference loads need no optimizer template at all (bench/simple
    # crashed with a template whose opt_state tree didn't match the
    # saved Adam state — this is the regression pin)
    from yoho_tpu.train.trainer import load_inference_variables

    for path in (plain, gz):
        vars_, bp = load_inference_variables(path, v0)
        assert bp == 0.5
        for a, b in zip(
            jax.tree.leaves(vars_["params"]), jax.tree.leaves(state.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _random_small_rotation(rng, max_deg=15.0):
    from yoho_tpu.utils.so3 import matrix_from_quaternion

    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = np.radians(rng.uniform(0, max_deg))
    q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
    return matrix_from_quaternion(q)


def test_augment_group_batch_labels_exact(rng):
    """Augmented (R, true_idx, delta_q) must satisfy the same defining
    relations as baked labels (data/trainset.py bake_train_batches):
    true_idx = nearest group element of R, delta_q = quat(R @ R_gi^T)."""
    from yoho_tpu.data.trainset import augment_group_batch
    from yoho_tpu.group.icosahedral import nearest_group_index
    from yoho_tpu.utils.so3 import quaternion_from_matrix

    G = get_group()
    B = 24
    gi = rng.integers(0, 60, B)
    R = np.stack([_random_small_rotation(rng) @ G.rotations[g] for g in gi])
    dq = np.stack([quaternion_from_matrix(R[b] @ G.rotations[gi[b]].T) for b in range(B)])
    batch = {
        "feats0": rng.normal(size=(B, 60, 8)).astype(np.float32),
        "feats1": rng.normal(size=(B, 60, 8)).astype(np.float32),
        "R": R.astype(np.float32),
        "true_idx": gi.astype(np.int32),
        "delta_q": dq.astype(np.float32),
    }
    out = augment_group_batch(batch, rng, G)
    assert not np.array_equal(out["true_idx"], batch["true_idx"])
    for b in range(B):
        assert nearest_group_index(out["R"][b], G.rotations) == out["true_idx"][b]
        q_ref = quaternion_from_matrix(
            out["R"][b] @ G.rotations[out["true_idx"][b]].T
        )
        # quaternion sign is a gauge freedom
        d = min(
            np.abs(q_ref - out["delta_q"][b]).max(),
            np.abs(q_ref + out["delta_q"][b]).max(),
        )
        assert d < 1e-4, f"delta_q mismatch {d}"


def test_augment_group_batch_preserves_feature_relation(rng):
    """If feats1 is the exact group-permuted copy of feats0 under the
    label index (cloud1 = R[gi] @ cloud0), that relation must survive
    augmentation with the new label: feats1'[g] = feats0'[cayley[gi', g]]."""
    from yoho_tpu.data.trainset import augment_group_batch
    from yoho_tpu.utils.so3 import quaternion_from_matrix

    G = get_group()
    B = 16
    gi = rng.integers(0, 60, B)
    feats0 = rng.normal(size=(B, 60, 8)).astype(np.float32)
    feats1 = np.stack([feats0[b][G.cayley[gi[b]]] for b in range(B)])
    batch = {
        "feats0": feats0,
        "feats1": feats1,
        "R": G.rotations[gi].astype(np.float32),
        "true_idx": gi.astype(np.int32),
        "delta_q": np.tile(np.array([1.0, 0, 0, 0], np.float32), (B, 1)),
    }
    out = augment_group_batch(batch, rng, G)
    for b in range(B):
        np.testing.assert_allclose(
            out["feats1"][b],
            out["feats0"][b][G.cayley[out["true_idx"][b]]],
            atol=1e-6,
        )
        # exact group rotations keep an identity residual
        np.testing.assert_allclose(
            np.abs(out["delta_q"][b][0]), 1.0, atol=1e-5
        )


def test_load_checkpoint_across_optimizer_change(tmp_path, rng):
    """An adam-era checkpoint must load under an adamw template (the
    weight_decay knob changes the opt_state pytree): params/step restore,
    optimizer restarts fresh."""
    import dataclasses

    import optax

    from yoho_tpu.train.trainer import load_checkpoint, save_checkpoint
    from yoho_tpu.train.steps import make_optimizer

    cfg = default_config()
    model = PartINetwork(cfg.part1)
    feats = jnp.asarray(rng.normal(size=(4, 60, 32)).astype(np.float32))
    v0 = model.init(jax.random.PRNGKey(0), feats, False)
    adam_state = init_train_state(v0, make_optimizer(cfg.train, 10))
    adam_state = adam_state._replace(step=jnp.asarray(42, jnp.int32))
    fn = str(tmp_path / "model.pkl")
    save_checkpoint(fn, adam_state, 0.7)

    wd_cfg = dataclasses.replace(cfg.train, weight_decay=1e-4)
    adamw_template = init_train_state(v0, make_optimizer(wd_cfg, 10))
    loaded, best = load_checkpoint(fn, adamw_template)
    assert best == 0.7
    assert int(loaded.step) == 42
    for a, b in zip(jax.tree.leaves(loaded.params), jax.tree.leaves(adam_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_f16_release_roundtrip(tmp_path, rng):
    """float16-stored release checkpoints load back at template dtype
    within f16 tolerance (scripts/export_release.py --dtype float16)."""
    import gzip
    import pickle

    import optax
    from flax import serialization

    from yoho_tpu.train.trainer import (
        load_checkpoint,
        load_inference_variables,
    )

    cfg = default_config()
    model = PartINetwork(cfg.part1)
    feats = jnp.asarray(rng.normal(size=(4, 60, 32)).astype(np.float32))
    v0 = model.init(jax.random.PRNGKey(0), feats, False)
    opt = optax.adam(optax.constant_schedule(1e-4))
    state = init_train_state(v0, opt)
    shrink = lambda x: x.astype(jnp.float16) if jnp.issubdtype(x.dtype, jnp.floating) else x
    slim = state._replace(
        params=jax.tree.map(shrink, state.params),
        batch_stats=jax.tree.map(shrink, state.batch_stats),
        opt_state=jax.tree.map(jnp.zeros_like, state.opt_state),
    )
    fn = str(tmp_path / "release.pkl")
    with gzip.open(fn, "wb") as f:
        pickle.dump(
            {"state": serialization.to_bytes(slim), "best_para": 0.1, "step": 7}, f
        )
    loaded, _ = load_checkpoint(fn, state)
    vars_, _ = load_inference_variables(fn, v0)
    for got in (loaded.params, vars_["params"]):
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(state.params)):
            assert np.asarray(a).dtype == np.float32
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
            )


def test_generate_rotated_features_pipelined(tmp_path, rng):
    """The depth-1 pipelined generator writes the same content as a
    serial materialization: f16 features, valid-kn prefix, one npz per
    cloud, exists-skip idempotent."""
    import types

    from yoho_tpu.data.trainset import generate_rotated_features

    out = str(tmp_path)
    kdir = os.path.join(out, "Filtered_Keys", "synth/sc")
    os.makedirs(kdir)
    clouds = {i: rng.uniform(-1, 1, (50, 3)).astype(np.float32) for i in range(3)}
    for i in clouds:
        np.save(os.path.join(kdir, f"{i}_index.npy"), np.arange(7))

    ds = types.SimpleNamespace(
        name="synth/sc", pc_ids=list(clouds), get_pc=lambda i: clouds[i]
    )
    calls = []

    def lift_fn(pc_r, keys_r):
        calls.append(len(calls))
        # device-array stand-in: f16 array whose rows encode the call id
        arr = np.full((10, 4, 2), float(len(calls)), np.float16)
        return arr, len(keys_r)

    generate_rotated_features(
        lift_fn, {"sc": ds, "wholesetname": None}, out, pad=64, n_rot=2
    )
    fdir = os.path.join(out, "Rotated_Features", "synth/sc")
    assert sorted(os.listdir(fdir)) == ["0_feats.npz", "1_feats.npz", "2_feats.npz"]
    z = np.load(os.path.join(fdir, "1_feats.npz"))
    assert z["feats"].dtype == np.float16
    assert z["feats"].shape == (2, 7, 4, 2)  # n_rot x kn(valid) x ...
    assert z["Rs"].shape == (2, 3, 3)
    # rerun: exists-skip, no extra lifts
    n = len(calls)
    generate_rotated_features(
        lift_fn, {"sc": ds, "wholesetname": None}, out, pad=64, n_rot=2
    )
    assert len(calls) == n


def _oracle_part2_batch(rng, G, Ws, B=32, noise=0.0):
    """PartII batch from ORACLE equivariant features.

    Simulates a perfect backbone+PartI: per sample, a smooth random
    function phi(Q) = tanh(W2 tanh(W1 vec(Q))) of the patch orientation
    stands in for the lifted descriptor, so feats[g] = phi(R_g A) obeys
    the exact lift equivariance (bake semantics, data/trainset.py
    bake_train_batches: R maps frame0 -> frame1, feats1[g] = phi(R_g R A),
    true_idx/delta_q from the nearest group element). Lets PartII head
    quality be measured independently of descriptor quality (round-4
    VERDICT weak #8)."""
    from yoho_tpu.data.trainset import nearest_group_index
    from yoho_tpu.utils.so3 import quaternion_from_matrix, random_rotation_matrix

    def phi(Q, W1, W2):  # (..., 3, 3) -> (..., 32)
        v = Q.reshape(*Q.shape[:-2], 9)
        return np.tanh(np.tanh(v @ W1.T) @ W2.T)

    Rg = G.rotations  # (60, 3, 3)
    b = {k: [] for k in ("before_eqv0", "before_eqv1", "after_eqv0",
                         "after_eqv1", "true_idx", "delta_q")}
    for _ in range(B):
        A = random_rotation_matrix(rng)
        R = random_rotation_matrix(rng)
        gi = nearest_group_index(R, Rg)
        dq = quaternion_from_matrix(R @ Rg[gi].T)
        orbit0 = np.einsum("gij,jk->gik", Rg, A)       # R_g A
        orbit1 = np.einsum("gij,jk->gik", Rg, R @ A)   # R_g R A
        for tag, (W1, W2) in zip(("before", "after"), Ws):
            f0 = phi(orbit0, W1, W2)
            f1 = phi(orbit1, W1, W2)
            if noise:
                f0 = f0 + noise * rng.normal(size=f0.shape)
                f1 = f1 + noise * rng.normal(size=f1.shape)
            b[f"{tag}_eqv0"].append(f0.astype(np.float32))
            b[f"{tag}_eqv1"].append(f1.astype(np.float32))
        b["true_idx"].append(gi)
        b["delta_q"].append(dq.astype(np.float32))
    return {
        k: jnp.asarray(np.stack(v) if k != "true_idx" else np.asarray(v, np.int32))
        for k, v in b.items()
    }


@pytest.mark.slow
def test_part2_oracle_features_single_digit_degrees(rng):
    """With oracle (perfect-equivariance) input features, the PartII
    head + training loop must drive the residual-rotation error to
    single digits of degrees — far below the ~identity-prediction
    baseline. Separates head quality from descriptor quality: if the
    ladder's PartII stalls at high error with a good backbone, the head
    is at fault; if this test passes, the descriptors are."""
    import dataclasses

    from yoho_tpu.models.part2 import PartIINetwork
    from yoho_tpu.train.losses import quaternion_angular_error_deg
    from yoho_tpu.train.steps import part2_train_step

    G = get_group()
    cfg = default_config()
    Ws = [
        (rng.normal(size=(64, 9)), rng.normal(size=(32, 64)))
        for _ in range(2)
    ]
    model = PartIINetwork(cfg.part2)
    b0 = _oracle_part2_batch(rng, G, Ws, B=8)
    variables = model.init(
        jax.random.PRNGKey(0), b0["before_eqv0"], b0["before_eqv1"],
        b0["after_eqv0"], b0["after_eqv1"], b0["true_idx"], False,
    )
    tcfg = dataclasses.replace(cfg.train, lr_init=1e-3)
    opt = make_optimizer(tcfg, steps_per_epoch=10000)
    state = init_train_state(variables, opt)
    step = jax.jit(lambda s, b: part2_train_step(model, opt, tcfg, s, b))
    for i in range(400):
        state, metrics = step(state, _oracle_part2_batch(rng, G, Ws, B=32))
    assert np.isfinite(float(metrics["loss"]))

    # identity-prediction baseline: residual angle of the raw labels
    val = _oracle_part2_batch(rng, G, Ws, B=128)
    ident = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (128, 1))
    base = float(quaternion_angular_error_deg(ident, val["delta_q"]).mean())
    q = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        val["before_eqv0"], val["before_eqv1"], val["after_eqv0"],
        val["after_eqv1"], val["true_idx"], False,
    )
    err = float(quaternion_angular_error_deg(q, val["delta_q"]).mean())
    print(f"oracle PartII: err {err:.2f} deg (identity baseline {base:.2f})")
    assert base > 10.0  # labels carry real residuals
    assert err < 10.0, f"PartII head failed to converge: {err:.1f} deg"
    assert err < base / 2
