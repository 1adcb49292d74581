"""Backbone registry parity: every reference `load_model` name resolves
and a representative of each topology family runs forward.

Reference inventory: ``fcgf_model/resunet.py:196-246`` (ResUNet2 +
BN2/BN2B-E + IN2/IN2B-E) and ``fcgf_model/simpleunet.py:8-541``
(SimpleNet/2/3 with None/BN/IN/E variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoho_tpu.models import RESUNET_VARIANTS, load_model, model_names

REFERENCE_NAMES = [
    # resunet.py
    "ResUNet2", "ResUNetBN2", "ResUNetBN2B", "ResUNetBN2C", "ResUNetBN2D",
    "ResUNetBN2E", "ResUNetIN2", "ResUNetIN2B", "ResUNetIN2C", "ResUNetIN2D",
    "ResUNetIN2E",
    # simpleunet.py
    "SimpleNet", "SimpleNetIN", "SimpleNetBN", "SimpleNetBNE", "SimpleNetINE",
    "SimpleNet2", "SimpleNetIN2", "SimpleNetBN2", "SimpleNetBN2B",
    "SimpleNetBN2C", "SimpleNetBN2D", "SimpleNetBN2E", "SimpleNetIN2E",
    "SimpleNet3", "SimpleNetIN3", "SimpleNetBN3", "SimpleNetBN3B",
    "SimpleNetBN3C", "SimpleNetBN3D", "SimpleNetBN3E", "SimpleNetIN3E",
]


def test_registry_complete():
    names = set(model_names())
    missing = [n for n in REFERENCE_NAMES if n not in names]
    assert not missing, f"missing reference backbones: {missing}"


# fast tier keeps two cheap representatives (plain-BN simpleunet + the
# dense-1x1-tail family); the expensive ResUNet/IN variants run in the
# slow tier — ResUNetBN2C (the production topology) is exercised all
# over the fast tier already (pytest.ini: fast tier promises < 2 min).
@pytest.mark.parametrize(
    "name",
    [
        pytest.param("ResUNet2", marks=pytest.mark.slow),
        pytest.param("ResUNetIN2E", marks=pytest.mark.slow),
        pytest.param("SimpleNetBN", marks=pytest.mark.slow),
        pytest.param("SimpleNetIN2", marks=pytest.mark.slow),
        "SimpleNetBN3E",
    ],
)
def test_variant_forward(name, rng):
    from yoho_tpu.ops.voxel import build_grid

    cloud = rng.uniform(-0.5, 0.5, size=(800, 3)).astype(np.float32)
    pad = 1024
    pts = jnp.zeros((pad, 3), jnp.float32).at[:800].set(jnp.asarray(cloud))
    grid, _ = jax.jit(lambda p: build_grid(p, 0.05, 800))(pts)

    model, plan_builder = load_model(name)
    plan = jax.jit(plan_builder)(grid)
    feats = jnp.ones((pad, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats, plan, False)
    out = model.apply(variables, feats, plan, False)
    # SimpleNet3 family ends in a 1x1 conv to tr_channels[1] (reference
    # simpleunet.py:446-453) — its output dim is NOT out_channels.
    from yoho_tpu.models.simpleunet import SIMPLENET_VARIANTS

    spec = SIMPLENET_VARIANTS.get(name, {})
    exp = spec["tr_channels"][0] if spec.get("tail_style") == "dense1x1" else 32
    assert out.shape == (pad, exp)
    assert bool(jnp.isfinite(out).all())
    # padding rows stay zero (zero-row invariant)
    n_valid = int(grid.count)
    np.testing.assert_array_equal(np.asarray(out)[n_valid:], 0.0)


def test_resunet_bn2c_matches_default_config():
    from yoho_tpu.config import BackboneConfig

    cfg = BackboneConfig()
    spec = RESUNET_VARIANTS["ResUNetBN2C"]
    assert tuple(cfg.channels) == spec["channels"]
    assert tuple(cfg.tr_channels) == spec["tr_channels"]
