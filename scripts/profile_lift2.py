"""Decompose the batched-grid lift (pipeline/lifting.py) by phase.

Phases per bg-rotation mini-batch (exactly the lift's structure):
  A. rotate + quantize + unique_voxels (one big sort)
  B. build_unet_plan (stride pyramid + kernel-map joins)
  C. FCGF network apply (gathers + MXU matmuls)
  D. per-rotation compaction + kNN transfer + feature gather

Run on the real TPU chip: `python scripts/profile_lift2.py`.
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
    from yoho_tpu.ops.voxel import unique_voxels

    cfg = default_config()
    kn = cfg.pad.num_keypoints
    n_pts = 20000
    n_pad = 16384  # matches the bench's prevoxelized bucket
    nv = 16384
    bg = int(os.environ.get("BG", "4"))
    rng = np.random.default_rng(0)

    u = rng.uniform(0, 2 * np.pi, n_pts)
    v = rng.uniform(0, np.pi, n_pts)
    r = 1.0 + 0.25 * np.sin(3 * u) * np.cos(2 * v)
    pts = np.stack(
        [r * np.sin(v) * np.cos(u), r * np.sin(v) * np.sin(u), r * np.cos(v)], axis=1
    ).astype(np.float32)
    pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    # emulate host prevoxelize: dedup to <= n_pad representatives
    vox = np.floor(pts / cfg.backbone.voxel_size).astype(np.int32)
    _, keep = np.unique(vox, axis=0, return_index=True)
    pts = pts[keep][:n_pad]
    keys = pts[rng.choice(len(pts), kn, replace=False)]
    num_points = len(pts)
    pts_pad = np.zeros((n_pad, 3), np.float32)
    pts_pad[:num_points] = pts

    pts_j = jnp.asarray(pts_pad)
    keys_j = jnp.asarray(keys)
    Rgroup = jnp.asarray(get_group().rotations, jnp.float32)
    Rb = Rgroup[:bg]

    model = SparseResUNet(cfg.backbone)
    voxel_size = cfg.backbone.voxel_size
    c1k = cfg.backbone.conv1_kernel_size

    @jax.jit
    def phase_a(points, Rb):
        pts = jnp.einsum("nd,gkd->gnk", points, Rb)
        flat_pts = pts.reshape(bg * n_pad, 3)
        xyz = jnp.floor(flat_pts / voxel_size).astype(jnp.int32)
        bidx = jnp.repeat(jnp.arange(bg, dtype=jnp.int32), n_pad)
        coords = jnp.concatenate([bidx[:, None], xyz], axis=1)
        valid = jnp.tile(jnp.arange(n_pad) < num_points, bg)
        grid, first = unique_voxels(coords, valid, out_size=bg * nv)
        return grid, first, flat_pts

    @jax.jit
    def phase_b(grid):
        return build_unet_plan(grid, c1k)

    grid, first, flat_pts = phase_a(pts_j, Rb)
    plan = phase_b(grid)
    fcgf_vars = model.init(
        jax.random.PRNGKey(0), jnp.ones((bg * nv, 1), jnp.float32), plan, False
    )

    @jax.jit
    def phase_c(plan):
        return model.apply(fcgf_vars, jnp.ones((bg * nv, 1), jnp.float32), plan, False)

    @jax.jit
    def phase_d(plan, grid, first, flat_pts, f, Rb):
        batch_of = jnp.where(plan.mask1, grid.coords[:, 0], bg)
        counts = jnp.sum(
            batch_of[None, :] == jnp.arange(bg)[:, None], axis=1
        ).astype(jnp.int32)
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        j = jnp.arange(nv)
        ok = j[None, :] < counts[:, None]
        row = jnp.where(ok, starts[:, None] + j[None, :], bg * nv - 1)
        vox_pts = flat_pts[first]
        vox_b = vox_pts[row.reshape(-1)].reshape(bg, nv, 3)
        keys_r = jnp.einsum("kd,gid->gki", keys_j, Rb)
        padk = (-kn) % 1024
        if padk:
            keys_r = jnp.concatenate(
                [keys_r, jnp.zeros((bg, padk, 3), keys_r.dtype)], axis=1
            )
        idx = jax.vmap(lambda q, base, m: nn_search(q, base, m, chunk=1024))(
            keys_r, vox_b, ok
        )[:, :kn]
        flat_idx = starts[:, None] + idx
        return f[flat_idx.reshape(-1)].reshape(bg, kn, -1)

    f = phase_c(plan)

    # Distinct input variants per rep: the remote-execution tunnel
    # deduplicates identical dispatches (same executable + same
    # buffers), so timing N identical calls measures ~0. Cycle jittered
    # clouds and block every rep instead.
    variants = []
    for s in range(3):
        jit_pts = jnp.asarray(
            pts_pad + rng.normal(scale=1e-4, size=pts_pad.shape).astype(np.float32)
            * (np.arange(n_pad) < num_points)[:, None]
        )
        g_v, first_v, fp_v = phase_a(jit_pts, Rb)
        p_v = phase_b(g_v)
        f_v = phase_c(p_v)
        variants.append((jit_pts, g_v, first_v, fp_v, p_v, f_v))

    def timeit(fn, argpick, reps=6):
        for s in range(2):  # warm every variant's shapes (one program)
            jax.block_until_ready(fn(*argpick(variants[s])))
        ts = []
        for i in range(reps):
            a = argpick(variants[i % len(variants)])
            t0 = time.time()
            jax.block_until_ready(fn(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t_a = timeit(phase_a, lambda v: (v[0], Rb))
    t_b = timeit(phase_b, lambda v: (v[1],))
    t_c = timeit(phase_c, lambda v: (v[4],))
    t_d = timeit(phase_d, lambda v: (v[4], v[1], v[2], v[3], v[5], Rb))
    scale = 60 / bg
    tot = (t_a + t_b + t_c + t_d) * scale
    print(f"bg={bg} n_pad={n_pad} nv={nv} bg*nv={bg*nv} num_points={num_points}")
    for name, t in [("A unique", t_a), ("B plan", t_b), ("C net", t_c), ("D knn", t_d)]:
        print(f"{name:10s}: {t*1e3:8.1f} ms/batch -> {t*scale:6.3f} s/cloud")
    print(f"total     : {tot:6.3f} s/cloud")


if __name__ == "__main__":
    main()
