"""Decompose the 60-rotation lift cost: plan-build vs FCGF conv vs kNN.

Run on the real TPU chip. Each phase is jitted separately on the same
padded shapes the bench uses so steady-state timings attribute the lift
wall-clock to its irregular (sort/search) and dense (MXU) parts.
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
    import jax.numpy as jnp

    from yoho_tpu.config import default_config
    from yoho_tpu.group import get_group
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.knn import nn_search
    from yoho_tpu.ops.voxel import build_grid

    cfg = default_config()
    pad = cfg.pad.max_voxels
    kn = cfg.pad.num_keypoints
    n_pts = 20000
    rng = np.random.default_rng(0)

    u = rng.uniform(0, 2 * np.pi, n_pts)
    v = rng.uniform(0, np.pi, n_pts)
    r = 1.0 + 0.25 * np.sin(3 * u) * np.cos(2 * v)
    pts = np.stack(
        [r * np.sin(v) * np.cos(u), r * np.sin(v) * np.sin(u), r * np.cos(v)], axis=1
    ).astype(np.float32)
    pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    keys = pts[rng.choice(n_pts, kn, replace=False)]

    pts_pad = np.zeros((pad, 3), np.float32)
    pts_pad[:n_pts] = pts
    pts_j = jnp.asarray(pts_pad)
    keys_j = jnp.asarray(keys)
    Rgroup = jnp.asarray(get_group().rotations, jnp.float32)

    model = SparseResUNet(cfg.backbone)

    BG = int(os.environ.get("BG", "4"))

    @jax.jit
    def plans_only(points, Rb):
        def one(R):
            p = points @ R.T
            grid, first = build_grid(p, cfg.backbone.voxel_size, n_pts)
            return build_unet_plan(grid, cfg.backbone.conv1_kernel_size), first

        return jax.vmap(one)(Rb)

    # init vars on one plan
    plan1, first1 = jax.tree.map(lambda x: x[0], plans_only(pts_j, Rgroup[:BG]))
    fcgf_vars = model.init(
        jax.random.PRNGKey(0), jnp.ones((pad, 1), jnp.float32), plan1, False
    )

    @jax.jit
    def net_only(plans):
        def one(plan):
            return model.apply(fcgf_vars, jnp.ones((pad, 1), jnp.float32), plan, False)

        return jax.vmap(one)(plans)

    @jax.jit
    def knn_only(points, Rb, plans, firsts):
        def one(R, plan, first):
            p = points @ R.T
            vox = p[first]
            kr = keys_j @ R.T
            padk = (-kn) % 1024
            if padk:
                kr = jnp.concatenate([kr, jnp.zeros((padk, 3))], axis=0)
            return nn_search(kr, vox, plan.mask1, chunk=1024)[:kn]

        return jax.vmap(one)(Rb, plans, firsts)

    def timeit(f, *a, reps=3, warm=1):
        for _ in range(warm):
            jax.block_until_ready(f(*a))
        t0 = time.time()
        for _ in range(reps):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps

    Rb = Rgroup[:BG]
    t_plan = timeit(plans_only, pts_j, Rb)
    plans, firsts = plans_only(pts_j, Rb)
    t_net = timeit(net_only, plans)
    t_knn = timeit(knn_only, pts_j, Rb, plans, firsts)
    scale = 60 / BG
    print(
        f"BG={BG} pad={pad}\n"
        f"plan-build: {t_plan:.3f}s/batch -> {t_plan*scale:.2f}s/cloud\n"
        f"network   : {t_net:.3f}s/batch -> {t_net*scale:.2f}s/cloud\n"
        f"knn       : {t_knn:.3f}s/batch -> {t_knn*scale:.2f}s/cloud\n"
        f"total     : {(t_plan+t_net+t_knn)*scale:.2f}s/cloud"
    )


if __name__ == "__main__":
    main()
