"""Lightweight standalone feature API (reference ``simple_yoho/``).

``fcgf_extractor.run(pc, voxel_size)`` and
``yoho_extractor.run(pc, voxel_size, nkpts)`` re-created TPU-first
(reference ``simple_yoho/fcgf_feat.py:51-55``,
``simple_yoho/yoho_extract.py:73-77``): one jitted program per voxel
bucket instead of the reference's 60-iteration Python loop over
rotations; voxel dedup, the UNet, the 60-rotation lift and the PartI
head all run on device.

Layout note: equivariant tensors here are (Kn, 60, C) — group axis
second — not the reference's (Kn, C, 60).

    from yoho_tpu.simple import YOHOExtractor
    ex = YOHOExtractor(model_dir="./model")
    kpts, inv, eqv = ex.run(pc, voxel_size=0.025, nkpts=5000)
"""

from __future__ import annotations

import os

import numpy as np


def _load_vars(model, init_args, ckpt, allow_random: bool):
    """Init a flax model and overwrite with a trained checkpoint.

    Mirrors the reference extractors' strict checkpoint loads
    (``simple_yoho/yoho_extract.py:29-31``); a missing checkpoint is an
    error unless ``allow_random`` (useful for smoke tests only).
    """
    import jax

    from yoho_tpu.train.trainer import load_inference_variables

    v0 = model.init(jax.random.PRNGKey(0), *init_args)
    if os.path.exists(ckpt):
        vars_, _ = load_inference_variables(ckpt, v0)
        return vars_
    if not allow_random:
        raise FileNotFoundError(
            f"no checkpoint at {ckpt} (pass allow_random=True to use "
            "random weights)"
        )
    return v0


class FCGFExtractor:
    """FCGF voxel features for one cloud (reference ``fcgf_extractor``).

    run(pc, voxel_size) -> (xyz_down, feats): one representative raw
    point per occupied voxel and its 32-d L2-normalized descriptor.
    """

    def __init__(self, model_dir: str = "./model", cfg=None, allow_random=False):
        import jax
        import jax.numpy as jnp

        from yoho_tpu.config import default_config
        from yoho_tpu.models.fcgf import SparseResUNet
        from yoho_tpu.models.plan import build_unet_plan
        from yoho_tpu.ops.voxel import build_grid

        self.jax, self.jnp = jax, jnp
        self.cfg = cfg or default_config()
        self.model = SparseResUNet(self.cfg.backbone)
        pad = self.cfg.pad.max_voxels
        k1 = self.cfg.backbone.conv1_kernel_size
        pts = jnp.zeros((pad, 3), jnp.float32)
        g0, _ = jax.jit(lambda p: build_grid(p, self.cfg.backbone.voxel_size, 10))(pts)
        plan0 = jax.jit(lambda g: build_unet_plan(g, k1))(g0)
        self.fcgf_vars = _load_vars(
            self.model,
            (jnp.ones((pad, 1), jnp.float32), plan0, False),
            os.path.join(model_dir, "Backbone", "model_best.pkl"),
            allow_random,
        )
        self._jit_cache: dict = {}

    def _fcgf_for_bucket(self, bucket: int, voxel_size: float):
        key = ("fcgf", bucket, voxel_size)
        if key not in self._jit_cache:
            jnp = self.jnp
            from yoho_tpu.models.plan import build_unet_plan
            from yoho_tpu.ops.voxel import build_grid

            k1 = self.cfg.backbone.conv1_kernel_size

            @self.jax.jit
            def fwd(points, n):
                grid, first = build_grid(points, voxel_size, n)
                plan = build_unet_plan(grid, k1)
                feats_in = jnp.ones((points.shape[0], 1), points.dtype)
                f = self.model.apply(self.fcgf_vars, feats_in, plan, False)
                return f, points[first], plan.mask1

            self._jit_cache[key] = fwd
        return self._jit_cache[key]

    def _pad(self, pts: np.ndarray):
        bucket = min(self.cfg.pad.bucket_for(len(pts)), self.cfg.pad.max_voxels)
        out = np.zeros((bucket, 3), np.float32)
        n = min(len(pts), bucket)
        out[:n] = pts[:n]
        return out, n, bucket

    def run(self, pc: np.ndarray, voxel_size: float = 0.025):
        from yoho_tpu.pipeline.runner import host_prevoxelize

        reps = host_prevoxelize(
            np.asarray(pc, np.float32), voxel_size, self.cfg.pad.max_voxels
        )
        padded, n, bucket = self._pad(reps)
        f, xyz, mask = self._fcgf_for_bucket(bucket, voxel_size)(
            self.jnp.asarray(padded), n
        )
        valid = np.asarray(mask)
        return np.asarray(xyz)[valid], np.asarray(f)[valid]


class YOHOExtractor(FCGFExtractor):
    """YOHO rotation-invariant/equivariant descriptors for one cloud
    (reference ``yoho_extractor``, ``simple_yoho/yoho_extract.py``).

    run(pc, voxel_size, nkpts) -> (kpts (nkpts,3), inv (nkpts,32),
    eqv (nkpts,60,32)).
    """

    def __init__(self, model_dir: str = "./model", cfg=None, allow_random=False,
                 seed: int = 0):
        super().__init__(model_dir, cfg, allow_random)
        import jax.numpy as jnp

        from yoho_tpu.models.part1 import PartINetwork

        self.part1 = PartINetwork(self.cfg.part1)
        self.part1_vars = _load_vars(
            self.part1,
            (jnp.zeros((8, 60, 32), jnp.float32), False),
            os.path.join(model_dir, "PartI", "model_best.pkl"),
            allow_random,
        )
        self.rng = np.random.default_rng(seed)

    def _lift_for_bucket(self, bucket: int, nkpts: int, voxel_size: float):
        key = ("lift", bucket, nkpts, voxel_size)
        if key not in self._jit_cache:
            from yoho_tpu.pipeline.lifting import lift_group_features

            def apply_fn(v, feats, plan):
                return self.model.apply(v, feats, plan, False)

            k1 = self.cfg.backbone.conv1_kernel_size

            @self.jax.jit
            def lift(points, n, keys):
                F = lift_group_features(
                    apply_fn, self.fcgf_vars, points, n, keys,
                    voxel_size, k1, rotations_per_batch=4,
                )
                out = self.part1.apply(self.part1_vars, F, False)
                return out["inv"], out["eqv"]

            self._jit_cache[key] = lift
        return self._jit_cache[key]

    def run(self, pc: np.ndarray, voxel_size: float = 0.025, nkpts: int = 5000):
        from yoho_tpu.pipeline.runner import host_prevoxelize

        pc = np.asarray(pc, np.float32)
        # random keypoint sampling (reference yoho_extract.py:44-46)
        replace = len(pc) < nkpts
        kpts = pc[self.rng.choice(len(pc), nkpts, replace=replace)]
        reps = host_prevoxelize(pc, voxel_size, self.cfg.pad.max_voxels)
        padded, n, bucket = self._pad(reps)
        inv, eqv = self._lift_for_bucket(bucket, nkpts, voxel_size)(
            self.jnp.asarray(padded), n, self.jnp.asarray(kpts)
        )
        return kpts, np.asarray(inv), np.asarray(eqv)


def fcgf_features(pc, voxel_size=0.025, model_dir="./model", **kw):
    """One-call convenience wrapper over ``FCGFExtractor``."""
    return FCGFExtractor(model_dir, **kw).run(pc, voxel_size)


def yoho_features(pc, voxel_size=0.025, nkpts=5000, model_dir="./model", **kw):
    """One-call convenience wrapper over ``YOHOExtractor``."""
    return YOHOExtractor(model_dir, **kw).run(pc, voxel_size, nkpts)
