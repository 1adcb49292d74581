"""Backbone model registry — the ``load_model(name)`` analog of the
reference's ``fcgf_model/__init__.py:16-30``.

``load_model`` returns a ready flax module instance plus the plan
builder it needs (ResUNets consume a fixed 4-level ``UNetPlan``;
SimpleNets a generic ``LevelsPlan``)."""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

# Reference variant tables (``fcgf_model/resunet.py:196-246``). Channel
# tuples drop the leading None of the torch tables. IN2* variants keep
# BN after plain convs and use IN inside blocks, exactly like the
# reference (NORM_TYPE='BN', BLOCK_NORM_TYPE='IN').
RESUNET_VARIANTS = {
    "ResUNet2": dict(norm_type="none", block_norm_type="BN",
                     channels=(32, 64, 128, 256), tr_channels=(32, 64, 64, 128)),
    "ResUNetBN2": dict(norm_type="BN", block_norm_type="BN",
                       channels=(32, 64, 128, 256), tr_channels=(32, 64, 64, 128)),
    "ResUNetBN2B": dict(norm_type="BN", block_norm_type="BN",
                        channels=(32, 64, 128, 256), tr_channels=(64, 64, 64, 64)),
    "ResUNetBN2C": dict(norm_type="BN", block_norm_type="BN",
                        channels=(32, 64, 128, 256), tr_channels=(64, 64, 64, 128)),
    "ResUNetBN2D": dict(norm_type="BN", block_norm_type="BN",
                        channels=(32, 64, 128, 256), tr_channels=(64, 64, 128, 128)),
    "ResUNetBN2E": dict(norm_type="BN", block_norm_type="BN",
                        channels=(128, 128, 128, 256), tr_channels=(64, 128, 128, 128)),
    "ResUNetIN2": dict(norm_type="BN", block_norm_type="IN",
                       channels=(32, 64, 128, 256), tr_channels=(32, 64, 64, 128)),
    "ResUNetIN2B": dict(norm_type="BN", block_norm_type="IN",
                        channels=(32, 64, 128, 256), tr_channels=(64, 64, 64, 64)),
    "ResUNetIN2C": dict(norm_type="BN", block_norm_type="IN",
                        channels=(32, 64, 128, 256), tr_channels=(64, 64, 64, 128)),
    "ResUNetIN2D": dict(norm_type="BN", block_norm_type="IN",
                        channels=(32, 64, 128, 256), tr_channels=(64, 64, 128, 128)),
    "ResUNetIN2E": dict(norm_type="BN", block_norm_type="IN",
                        channels=(128, 128, 128, 256), tr_channels=(64, 128, 128, 128)),
}


def model_names() -> list:
    from yoho_tpu.models.simpleunet import SIMPLENET_VARIANTS

    return sorted(RESUNET_VARIANTS) + sorted(SIMPLENET_VARIANTS)


def load_model(name: str, base_cfg=None) -> Tuple[object, Callable]:
    """name -> (module, plan_builder(grid) -> plan).

    ``base_cfg`` (a ``BackboneConfig``) carries the non-topology knobs
    (voxel size, conv1 kernel, bn momentum, out channels ...); the
    variant table overrides channels and norm placement.
    """
    from yoho_tpu.config import BackboneConfig
    from yoho_tpu.models.plan import build_levels_plan, build_unet_plan

    cfg = base_cfg or BackboneConfig()
    if name in RESUNET_VARIANTS:
        from yoho_tpu.models.fcgf import SparseResUNet

        spec = RESUNET_VARIANTS[name]
        cfg = dataclasses.replace(cfg, model=name, **spec)
        model = SparseResUNet(cfg)

        def plan_builder(grid, _k1=cfg.conv1_kernel_size):
            return build_unet_plan(grid, _k1)

        return model, plan_builder

    from yoho_tpu.models.simpleunet import SIMPLENET_VARIANTS, SimpleUNet

    if name in SIMPLENET_VARIANTS:
        spec = SIMPLENET_VARIANTS[name]
        model = SimpleUNet(
            in_channels=cfg.in_channels,
            out_channels=cfg.out_channels,
            channels=spec["channels"],
            tr_channels=spec["tr_channels"],
            norm_type=spec["norm_type"],
            conv1_kernel_size=cfg.conv1_kernel_size,
            bn_momentum=cfg.bn_momentum,
            normalize_feature=cfg.normalize_feature,
            max_instances=cfg.max_instances,
            tail_style=spec.get("tail_style", "head"),
        )
        L = len(spec["channels"])

        def plan_builder(grid, _k1=cfg.conv1_kernel_size, _L=L):
            return build_levels_plan(grid, _L, _k1)

        return model, plan_builder

    raise KeyError(f"unknown model {name!r}; options: {model_names()}")
