"""Sweep the full-lift configuration on the real chip: rotations_per_
batch (bg) x backbone compute dtype (f32/bf16).

Honest timing per docs/PERF.md: distinct jittered input clouds per rep
(the remote tunnel dedups identical dispatches), block every rep,
report the median of 3. Output: s/cloud for each config.

Run: python scripts/profile_lift_sweep.py  [BGS=4,6,10] [DTYPES=float32,bfloat16]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from yoho_tpu.config import default_config
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.pipeline.lifting import lift_group_features

    cfg = default_config()
    kn = cfg.pad.num_keypoints
    n_pts, n_pad = 20000, 16384
    rng = np.random.default_rng(0)
    u = rng.uniform(0, 2 * np.pi, n_pts)
    v = rng.uniform(0, np.pi, n_pts)
    r = 1.0 + 0.25 * np.sin(3 * u) * np.cos(2 * v)
    pts = np.stack(
        [r * np.sin(v) * np.cos(u), r * np.sin(v) * np.sin(u), r * np.cos(v)], axis=1
    ).astype(np.float32)
    pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    vox = np.floor(pts / cfg.backbone.voxel_size).astype(np.int32)
    _, keep = np.unique(vox, axis=0, return_index=True)
    pts = pts[keep][:n_pad]
    n = len(pts)
    keys = pts[rng.choice(n, kn, replace=False)]
    print(f"cloud: {n} voxel reps, pad {n_pad}, kn {kn}", flush=True)

    bgs = [int(x) for x in os.environ.get("BGS", "4,6,10").split(",")]
    dtypes = os.environ.get("DTYPES", "float32,bfloat16").split(",")

    def pad_c(c):
        out = np.zeros((n_pad, 3), np.float32)
        out[: len(c)] = c
        return jnp.asarray(out)

    clouds = [
        pad_c(pts + rng.normal(scale=1e-4, size=pts.shape).astype(np.float32))
        for _ in range(4)
    ]
    kj = jnp.asarray(keys)

    for dt in dtypes:
        bcfg = dataclasses.replace(cfg.backbone, dtype=dt)
        model = SparseResUNet(bcfg)
        fcgf_apply = lambda v, f, p: model.apply(v, f, p, False)
        # random weights: conv cost is weight-independent
        from yoho_tpu.models.plan import build_unet_plan
        from yoho_tpu.ops.voxel import build_grid

        g0, _ = jax.jit(lambda p: build_grid(p, bcfg.voxel_size, 10))(clouds[0][:4096])
        plan0 = jax.jit(lambda g: build_unet_plan(g, bcfg.conv1_kernel_size))(g0)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.ones((4096, 1), jnp.float32), plan0, False
        )
        for bg in bgs:
            if 60 % bg:
                continue

            @jax.jit
            def lift(points, n_valid, k):
                return lift_group_features(
                    fcgf_apply, variables, points, n_valid, k,
                    bcfg.voxel_size, bcfg.conv1_kernel_size,
                    rotations_per_batch=bg,
                )

            t0 = time.time()
            jax.block_until_ready(lift(clouds[0], n, kj))
            tc = time.time() - t0
            ts = []
            for rep in range(3):
                c = clouds[1 + rep % 3]
                t0 = time.time()
                jax.block_until_ready(lift(c, n, kj))
                ts.append(time.time() - t0)
            print(
                f"dtype={dt:9s} bg={bg:2d}: {np.median(ts):.3f} s/cloud "
                f"(reps {['%.3f' % t for t in ts]}, compile+1st {tc:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
