"""Network tests: FCGF forward, PartI equivariance (the executable form
of the reference's self-check, ``utils/network.py:290-312``), PartII
shapes, des2dr recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoho_tpu.config import BackboneConfig, PartIConfig, PartIIConfig
from yoho_tpu.group import get_group
from yoho_tpu.models.fcgf import SparseResUNet
from yoho_tpu.models.part1 import PartINetwork, des2dr
from yoho_tpu.models.part2 import PartIINetwork, align_by_index
from yoho_tpu.models.plan import build_unet_plan
from yoho_tpu.ops.voxel import build_grid


@pytest.fixture(scope="module")
def fcgf_setup():
    rng = np.random.default_rng(0)
    cloud = rng.uniform(-0.5, 0.5, size=(800, 3)).astype(np.float32)
    pts = jnp.zeros((1024, 3), jnp.float32).at[:800].set(jnp.asarray(cloud))
    cfg = BackboneConfig(conv1_kernel_size=3)  # small kernel for test speed

    @jax.jit
    def prep(p):
        grid, _ = build_grid(p, 0.05, 800)
        return grid, build_unet_plan(grid, cfg.conv1_kernel_size)

    grid, plan = prep(pts)
    model = SparseResUNet(cfg)
    feats_in = jnp.ones((1024, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats_in, plan, False)
    return cfg, model, variables, grid, plan, feats_in


def test_fcgf_forward_shapes_and_norms(fcgf_setup):
    cfg, model, variables, grid, plan, feats_in = fcgf_setup
    out = model.apply(variables, feats_in, plan, False)
    c = int(grid.count)
    assert out.shape == (1024, 32)
    norms = np.linalg.norm(np.asarray(out)[:c], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)  # normalize_feature
    assert np.all(np.asarray(out)[c:] == 0)  # padding zeroed
    assert np.all(np.isfinite(np.asarray(out)))


def test_fcgf_train_mode_updates_stats(fcgf_setup):
    cfg, model, variables, grid, plan, feats_in = fcgf_setup
    out, mutated = model.apply(
        variables, feats_in, plan, True, mutable=["batch_stats"]
    )
    assert np.all(np.isfinite(np.asarray(out)))
    # running stats must move away from init
    leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaf if l.ndim == 1)


def test_part1_equivariance():
    """Rotating the lifted input permutes the group axis by cayley[i];
    the network output must permute identically and inv stay fixed."""
    G = get_group()
    cfg = PartIConfig()
    model = PartINetwork(cfg)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(7, 60, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), feats, False)
    out = model.apply(variables, feats, False)
    for i in [5, 23, 58]:
        perm = G.cayley[i]
        feats_i = feats[:, perm, :]
        out_i = model.apply(variables, feats_i, False)
        np.testing.assert_allclose(
            np.asarray(out_i["eqv"]),
            np.asarray(out["eqv"])[:, perm, :],
            atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_i["inv"]), np.asarray(out["inv"]), atol=2e-5
        )


def test_des2dr_recovers_index():
    G = get_group()
    rng = np.random.default_rng(2)
    D = jnp.asarray(rng.normal(size=(16, 60, 32)).astype(np.float32))
    for i in [0, 9, 41]:
        D_after = D[:, G.cayley[i], :]
        idx = np.asarray(des2dr(D, D_after))
        np.testing.assert_array_equal(idx, np.full(16, i))


def test_align_by_index_inverts_permutation():
    """align_by_index with the predicted index must de-rotate: if
    feats_after = feats[:, cayley[i]], aligning by i recovers a tensor
    whose g=0 slot is feats[cayley[i][0]] = feats[i]."""
    G = get_group()
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(4, 60, 8)).astype(np.float32))
    idx = jnp.asarray([7, 7, 7, 7], jnp.int32)
    out = align_by_index(feats, idx)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(feats)[:, G.cayley[7], :], atol=0
    )


def test_part2_shapes():
    cfg = PartIIConfig()
    model = PartIINetwork(cfg)
    rng = np.random.default_rng(4)
    B = 6
    f = lambda: jnp.asarray(rng.normal(size=(B, 60, 32)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 60, B), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), f(), f(), f(), f(), idx, False)
    q = model.apply(variables, f(), f(), f(), f(), idx, False)
    assert q.shape == (B, 4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_part1_bf16_inference_matches_f32(rng):
    """PartI bf16 inference dtype reproduces f32 descriptors within
    mixed-precision tolerance (outputs are L2-normalized f32)."""
    import dataclasses

    import jax

    from yoho_tpu.config import default_config

    cfg = default_config().part1
    m32 = PartINetwork(dataclasses.replace(cfg, dtype="float32"))
    mbf = PartINetwork(dataclasses.replace(cfg, dtype="bfloat16"))
    feats = jnp.asarray(rng.normal(size=(16, 60, 32)).astype(np.float32))
    v = m32.init(jax.random.PRNGKey(0), feats, False)
    o32 = m32.apply(v, feats, False)
    obf = mbf.apply(v, feats, False)
    for k in ("inv", "eqv"):
        a, b = np.asarray(o32[k]), np.asarray(obf[k])
        assert a.dtype == b.dtype == np.float32
        cos = (a * b).sum(-1)
        assert cos.min() > 0.995, f"{k}: min cos {cos.min()}"
    # train path ignores the compute dtype
    t32, _ = m32.apply(v, feats, True, mutable=["batch_stats"])
    tbf, _ = mbf.apply(v, feats, True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(t32["eqv"]), np.asarray(tbf["eqv"]))
