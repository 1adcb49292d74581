"""Typed configuration system.

Replaces the reference's four argparse modules
(``/root/reference/parses/parses_partI.py`` etc.) with frozen
dataclasses + a name registry. All reference hyperparameters are
preserved (sources cited inline); TPU-specific knobs (padding buckets,
mesh shape) are new.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict


@dataclasses.dataclass
class DirsConfig:
    base_dir: str = "."
    origin_data_dir: str = "./data/origin_data"
    output_cache_dir: str = "./data/YOHO_TPU"
    model_dir: str = "./model"


@dataclasses.dataclass
class BackboneConfig:
    """FCGF sparse ResUNet (reference ``fcgf_model/resunet.py:206-209``)."""

    model: str = "ResUNetBN2C"
    in_channels: int = 1
    out_channels: int = 32
    channels: tuple = (32, 64, 128, 256)
    tr_channels: tuple = (64, 64, 64, 128)
    # FCGF's public 3DMatch config uses a large (k=7) first conv to give
    # the 1-channel input context. TPU-first redesign: two stacked 3^3
    # convs (receptive field 5) — the 3^3 kernel map already exists for
    # the residual block, so the first layer costs NO extra kernel-map
    # search (the k>=5 map alone was ~70% of per-rotation plan cost).
    # We train from scratch, so topology parity is not required; set
    # conv1_kernel_size=5/7 + first_layer_double=False for the
    # reference-like single wide conv.
    conv1_kernel_size: int = 3
    first_layer_double: bool = True
    normalize_feature: bool = True
    bn_momentum: float = 0.05  # reference YOHO_testset.py:126
    voxel_size: float = 0.025  # 3DMatch (README.md:150); ETH 0.15, WHU-TLS 0.8
    dtype: str = "float32"
    # Norm placement mirrors the reference variant tables
    # (``fcgf_model/resunet.py:196-246``): norm_type after plain convs
    # ('BN' | 'IN' | 'none'), block_norm_type inside residual blocks.
    norm_type: str = "BN"
    block_norm_type: str = "BN"
    # static bound on batch indices for instance norm's segment sums
    max_instances: int = 64


@dataclasses.dataclass
class PadConfig:
    """Static-shape padding buckets for the sparse engine (TPU-specific)."""

    max_points: int = 65536  # raw points per cloud fed to quantization
    max_voxels: int = 32768  # unique voxels at stride 1
    num_keypoints: int = 5000  # reference README.md:95
    max_matches: int = 5000  # mutual-NN output cap (<= num_keypoints)
    # Static-shape ladder for per-cloud voxel budgets: the pipeline pads
    # each pre-voxelized cloud to the smallest bucket that fits, so
    # small clouds don't pay the 32k worst case (every sort/search/
    # gather in the lift scales with the bucket). One compile per
    # bucket, persistently cached.
    voxel_buckets: tuple = (8192, 16384, 24576, 32768)

    def bucket_for(self, n: int) -> int:
        # Strictly greater: row bucket-1 of every grid is the reserved
        # always-padding "zero row" (ops/voxel.py), so usable capacity
        # is bucket-1 voxels; a cloud that exactly fills a bucket must
        # take the next one or it would silently drop one voxel.
        for b in self.voxel_buckets:
            if n < b:
                return b
        return self.voxel_buckets[-1]


@dataclasses.dataclass
class PartIConfig:
    """PartI equivariant descriptor net (reference ``utils/network.py:67-105``)."""

    in_dim: int = 32
    hidden_dim: int = 256
    middle_dim: int = 512
    out_dim: int = 32
    num_residual_blocks: int = 1
    test_batch_size: int = 900  # parses_partI.py:93
    # Inference compute dtype (training pinned f32); see BackboneConfig.
    dtype: str = "float32"


@dataclasses.dataclass
class PartIIConfig:
    """PartII residual-rotation regressor (reference ``utils/network.py:218-278``)."""

    in_dim: int = 128  # 4 x 32 concatenated group features
    hidden_dim: int = 256
    middle_dim: int = 512
    fc_dims: tuple = (256, 512, 128, 4)
    num_residual_blocks: int = 1
    test_batch_size: int = 1000  # parses_partII.py:96


@dataclasses.dataclass
class TrainConfig:
    """Reference ``parses/parses_partI.py:50-73`` (PartII diffs noted)."""

    epochs: int = 5
    batch_size: int = 32
    lr_init: float = 1e-4  # PartII: 1e-3
    lr_decay_rate: float = 0.5
    lr_decay_step: float = 1.6  # epochs; PartII: 1.5
    train_log_step: int = 3000
    val_interval: int = 6000
    save_interval: int = 3000
    loss_margin: float = 0.3  # batch-hard margin, loss_val.py:48
    inv_loss_weight: float = 5.0  # loss_val.py:53
    # No reference analog (plain Adam, trainer.py:47): regularization
    # knob against the measured PartI rotation-head overfit (round-3
    # RESULTS.md). 0.0 = plain Adam, bitwise reference behavior.
    weight_decay: float = 0.0
    seed: int = 0


@dataclasses.dataclass
class RansacConfig:
    """Reference ``Test.py:13-16``, ``parses_partI.py:95-102``."""

    max_iter: int = 1000
    inlier_dist_c: float = 0.07  # YOHO-C (3DMatch)
    inlier_dist_o: float = 0.09  # YOHO-O (3DMatch)
    # All-inlier re-fit of the winning hypothesis (pipeline/ransac.py
    # refine_transform). DEVIATION from the reference, which keeps the
    # raw 3-point Kabsch (estimator.py:55-63): one masked SVD per pair
    # sharply reduces minimal-set translation error. 0 = bit-faithful.
    refine_iters: int = 2
    # YOHO-O: how many best-scoring per-match hypotheses to refine and
    # rescore (pipeline/ransac.py yoho_o_ransac). Noisy pre-refinement
    # ranking at low inlier ratios makes a wider candidate set win.
    refine_topk: int = 32
    fmr_ratio: float = 0.05  # tau_1
    ok_match_dist_threshold: float = 0.1  # tau_2
    rr_dist_threshold: float = 0.2  # tau_3


@dataclasses.dataclass
class MeshConfig:
    """Device-mesh layout for scale-out (no reference analog)."""

    data_axis: str = "data"
    group_axis: str = "group"
    data_parallel: int = 1
    group_parallel: int = 1


@dataclasses.dataclass
class PipelineConfig:
    dirs: DirsConfig = dataclasses.field(default_factory=DirsConfig)
    backbone: BackboneConfig = dataclasses.field(default_factory=BackboneConfig)
    pad: PadConfig = dataclasses.field(default_factory=PadConfig)
    part1: PartIConfig = dataclasses.field(default_factory=PartIConfig)
    part2: PartIIConfig = dataclasses.field(default_factory=PartIIConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    ransac: RansacConfig = dataclasses.field(default_factory=RansacConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    dataset: str = "3dmatch"

    def for_dataset(self, name: str) -> "PipelineConfig":
        """Apply per-dataset knob overrides (reference README.md:163-190)."""
        cfg = dataclasses.replace(self, dataset=name)
        if name.startswith("ETH"):
            cfg.backbone = dataclasses.replace(self.backbone, voxel_size=0.15)
            cfg.ransac = dataclasses.replace(
                self.ransac,
                inlier_dist_c=0.2,
                inlier_dist_o=0.2,
                ok_match_dist_threshold=0.2,
                rr_dist_threshold=0.5,
            )
        elif name.startswith("WHU"):
            cfg.backbone = dataclasses.replace(self.backbone, voxel_size=0.8)
            cfg.ransac = dataclasses.replace(
                self.ransac,
                inlier_dist_c=1.0,
                inlier_dist_o=1.0,
                ok_match_dist_threshold=0.5,
                rr_dist_threshold=1.0,
            )
        return cfg


# --------------------------------------------------------------------------
# Registry (replaces the reference's name2network/name2extractor/... dicts)
# --------------------------------------------------------------------------

_REGISTRIES: Dict[str, Dict[str, Any]] = {}


def register(kind: str, name: str) -> Callable:
    """Decorator: ``@register('estimator', 'yoho_c')``."""

    def deco(obj):
        _REGISTRIES.setdefault(kind, {})[name] = obj
        return obj

    return deco


def lookup(kind: str, name: str):
    try:
        return _REGISTRIES[kind][name]
    except KeyError:
        known = sorted(_REGISTRIES.get(kind, {}))
        raise KeyError(f"no {kind!r} named {name!r}; known: {known}") from None


def registry(kind: str) -> Dict[str, Any]:
    return dict(_REGISTRIES.get(kind, {}))


def default_config() -> PipelineConfig:
    cfg = PipelineConfig()
    # Inference compute dtype for the backbone (models/fcgf.py): bf16
    # halves the HBM gather traffic of the conv path. Overridable for
    # A/B profiling and for bit-exact f32 runs.
    env_dt = os.environ.get("YOHO_BACKBONE_DTYPE")
    if env_dt:
        cfg.backbone = dataclasses.replace(cfg.backbone, dtype=env_dt)
    return cfg
