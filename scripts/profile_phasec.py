"""Phase-C decomposition: full FCGF apply vs its convs alone.

docs/PERF.md measured phase C (network apply) at ~3.5x the summed
isolated conv times and attributed the gap to inter-conv elementwise
(BN/ReLU/mask/concat) HBM traffic. Back-of-envelope bandwidth math says
fused elementwise should be nearly free, so before optimizing anything
this script measures, on one fixed UNet plan (the lift's bg-rotation
batched grid):

  full    — the production eval-mode ``SparseResUNet.apply``
  convs   — ONLY the 11 sparse convs + 2 dense tails on the same plan,
            random weights (identical gathers/matmuls, zero elementwise)

both timed with the chained-``lax.scan`` anti-dedup pattern
(``profile_conv3.py``; never time repeated identical dispatches through
the tunnel). full - convs = the true elementwise/norm cost.

Run on the real chip: BG=6 python scripts/profile_phasec.py
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
    from yoho_tpu.ops.sparse_conv import sparse_conv
    from yoho_tpu.ops.voxel import unique_voxels

    cfg = default_config()
    n_pad = nv = int(os.environ.get("N_PAD", "16384"))
    bg = int(os.environ.get("BG", "6"))
    reps = int(os.environ.get("REPS", "8"))
    rng = np.random.default_rng(0)

    u = rng.uniform(0, 2 * np.pi, 20000)
    v = rng.uniform(0, np.pi, 20000)
    r = 1.0 + 0.25 * np.sin(3 * u) * np.cos(2 * v)
    pts = np.stack(
        [r * np.sin(v) * np.cos(u), r * np.sin(v) * np.sin(u), r * np.cos(v)], 1
    ).astype(np.float32)
    vox = np.floor(pts / cfg.backbone.voxel_size).astype(np.int32)
    _, keep = np.unique(vox, axis=0, return_index=True)
    pts = pts[keep][:n_pad]
    num_points = len(pts)
    pts_pad = np.zeros((n_pad, 3), np.float32)
    pts_pad[:num_points] = pts

    Rb = jnp.asarray(get_group().rotations[:bg], jnp.float32)
    voxel_size = cfg.backbone.voxel_size
    c1k = cfg.backbone.conv1_kernel_size

    @jax.jit
    def make_plan(points):
        p = jnp.einsum("nd,gkd->gnk", points, Rb).reshape(bg * n_pad, 3)
        xyz = jnp.floor(p / voxel_size).astype(jnp.int32)
        bidx = jnp.repeat(jnp.arange(bg, dtype=jnp.int32), n_pad)
        coords = jnp.concatenate([bidx[:, None], xyz], 1)
        valid = jnp.tile(jnp.arange(n_pad) < num_points, bg)
        grid, _ = unique_voxels(coords, valid, out_size=bg * nv)
        return build_unet_plan(grid, c1k)

    plan = jax.block_until_ready(make_plan(jnp.asarray(pts_pad)))

    model = SparseResUNet(cfg.backbone)
    feats0 = jnp.ones((bg * nv, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats0, plan, False)

    # ---- full apply, chained ----
    def chain(fn):
        @jax.jit
        def run(f0):
            def body(f, _):
                out = fn(f)
                # data dependency: next rep's input differs
                return f * (1.0 + 1e-30 * out[0, 0]), out[0, 0]

            _, outs = jax.lax.scan(body, f0, None, length=reps)
            return outs

        return run

    full = chain(lambda f: model.apply(variables, f, plan, False))
    t0 = time.time()
    jax.block_until_ready(full(feats0))
    print(f"full compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    jax.block_until_ready(full(feats0))
    t_full = (time.time() - t0) / reps
    print(f"full apply: {t_full*1e3:.1f} ms/batch", flush=True)

    # ---- convs only: same maps, same channel widths, no elementwise ----
    ch, tr = cfg.backbone.channels, cfg.backbone.tr_channels
    layers = [
        (plan.conv1, 1, ch[0]),
        (plan.b1, ch[0], ch[0]),
        (plan.b1, ch[0], ch[0]),
        (plan.down2, ch[0], ch[1]),
        (plan.b2, ch[1], ch[1]),
        (plan.b2, ch[1], ch[1]),
        (plan.down3, ch[1], ch[2]),
        (plan.b4_g4, ch[2], ch[2]),
        (plan.b4_g4, ch[2], ch[2]),
        (plan.down4, ch[2], ch[3]),
        (plan.b4_g8, ch[3], ch[3]),
        (plan.b4_g8, ch[3], ch[3]),
        (plan.up4, ch[3], tr[3]),
        (plan.b4_g4, tr[3], tr[3]),
        (plan.b4_g4, tr[3], tr[3]),
        (plan.up3, ch[2] + tr[3], tr[2]),
        (plan.b2, tr[2], tr[2]),
        (plan.b2, tr[2], tr[2]),
        (plan.up2, ch[1] + tr[2], tr[1]),
        (plan.b1, tr[1], tr[1]),
        (plan.b1, tr[1], tr[1]),
    ]
    ws = [
        jnp.asarray(rng.normal(scale=0.05, size=(k.in_idx.shape[0], ci, co)),
                    jnp.float32)
        for (k, ci, co) in layers
    ]
    wd1 = jnp.asarray(rng.normal(scale=0.05, size=(ch[1] + tr[1], tr[0])), jnp.float32)
    wd2 = jnp.asarray(rng.normal(scale=0.05, size=(tr[0], 32)), jnp.float32)

    def convs_only(f):
        x = f
        outs = {}
        for i, (k, ci, co) in enumerate(layers):
            # widen/narrow via slicing+tiling to match Cin without
            # elementwise arithmetic cost distortion (shapes must chain)
            if x.shape[1] != ci:
                reps_c = -(-ci // x.shape[1])
                x = jnp.tile(x, (1, reps_c))[:, :ci]
            x = sparse_conv(x, k, ws[i], variant="unrolled")
            outs[i] = x
        x = jnp.tile(x, (1, -(-(ch[1] + tr[1]) // x.shape[1])))[:, : ch[1] + tr[1]]
        x = x @ wd1
        x = x @ wd2
        return x

    convs = chain(convs_only)
    t0 = time.time()
    jax.block_until_ready(convs(feats0))
    print(f"convs compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    jax.block_until_ready(convs(feats0))
    t_convs = (time.time() - t0) / reps
    print(f"convs only: {t_convs*1e3:.1f} ms/batch", flush=True)
    print(
        f"elementwise/norm gap: {(t_full-t_convs)*1e3:.1f} ms/batch "
        f"({100*(t_full-t_convs)/max(t_full,1e-9):.0f}% of full)",
        flush=True,
    )


if __name__ == "__main__":
    main()
