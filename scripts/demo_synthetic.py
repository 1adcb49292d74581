"""End-to-end pipeline demo on a synthetic pair (no training needed).

Registers two copies of a random cloud related by a known rigid
transform whose rotation is (close to) an icosahedral group element.
Because the lifted FCGF group features are *exactly* equivariant, the
invariant descriptors of corresponding keypoints agree even with
untrained weights — so mutual matching, DR-index voting, and YOHO-C
RANSAC must recover the pose. This exercises every stage of the
inference pipeline (reference analog: ``Demo.py``) as a correctness
probe.

Usage: PYTHONPATH=/root/repo python scripts/demo_synthetic.py [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-points", type=int, default=20000)
    ap.add_argument("--n-keys", type=int, default=1000)
    ap.add_argument("--pad", type=int, default=32768)
    ap.add_argument("--group-index", type=int, default=23)
    ap.add_argument("--max-iter", type=int, default=1000)
    # Non-zero translation changes voxel binning, so untrained-FCGF
    # descriptors stop matching exactly (trained descriptors tolerate
    # it). Default 0 keeps this an exactness probe of the whole
    # pipeline; set e.g. 0.5 to eyeball robustness instead.
    ap.add_argument("--translation", type=float, default=0.0)
    ap.add_argument(
        "--vis-dir", default=None,
        help="write registration.ply/.png here (reference "
        "draw_registration_result analog, utils/utils_o3d.py)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # This is an exactness probe: TPU f32 matmuls default to bf16 inputs,
    # which blurs untrained-descriptor comparisons. Force full precision
    # here; the perf path keeps the default deliberately.
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from yoho_tpu.config import default_config
    from yoho_tpu.group import get_group
    from yoho_tpu.models.fcgf import SparseResUNet
    from yoho_tpu.models.part1 import PartINetwork, des2dr
    from yoho_tpu.pipeline.lifting import lift_group_features
    from yoho_tpu.pipeline.matching import group_mean_inv, mutual_match
    from yoho_tpu.pipeline.ransac import yoho_c_ransac
    from yoho_tpu.utils import so3

    cfg = default_config()
    G = get_group()
    rng = np.random.default_rng(0)

    # synthetic pair: cloud0 = R @ cloud1 + t
    cloud1 = rng.uniform(-1.2, 1.2, size=(args.n_points, 3)).astype(np.float32)
    R = G.rotations[args.group_index].astype(np.float32)
    t = rng.normal(size=3).astype(np.float32) * args.translation
    cloud0 = (cloud1 @ R.T + t).astype(np.float32)
    key_sel = rng.choice(args.n_points, args.n_keys, replace=False)
    keys1 = cloud1[key_sel]
    keys0 = cloud0[key_sel]

    def pad_pts(c):
        out = np.zeros((args.pad, 3), np.float32)
        out[: len(c)] = c
        return jnp.asarray(out)

    model = SparseResUNet(cfg.backbone)
    part1 = PartINetwork(cfg.part1)

    # init params on a tiny plan (shapes depend only on channel dims)
    from yoho_tpu.models.plan import build_unet_plan
    from yoho_tpu.ops.voxel import build_grid

    small = pad_pts(cloud1[:2000])[:4096]
    g0, _ = jax.jit(lambda p: build_grid(p, cfg.backbone.voxel_size, 2000))(small)
    plan0 = jax.jit(lambda g: build_unet_plan(g, cfg.backbone.conv1_kernel_size))(g0)
    fcgf_vars = model.init(
        jax.random.PRNGKey(0), jnp.ones((4096, 1), jnp.float32), plan0, False
    )
    p1_vars = part1.init(
        jax.random.PRNGKey(1), jnp.zeros((8, 60, 32), jnp.float32), False
    )

    fcgf_apply = lambda v, f, p: model.apply(v, f, p, False)

    @jax.jit
    def lift(points, n, keys):
        return lift_group_features(
            fcgf_apply,
            fcgf_vars,
            points,
            n,
            keys,
            cfg.backbone.voxel_size,
            cfg.backbone.conv1_kernel_size,
            rotations_per_batch=4,
        )

    t0 = time.time()
    F0 = lift(pad_pts(cloud0), args.n_points, jnp.asarray(keys0))
    F0.block_until_ready()
    print(f"lift cloud0: {time.time()-t0:.1f}s (incl. compile), shape {F0.shape}")
    t0 = time.time()
    F1 = lift(pad_pts(cloud1), args.n_points, jnp.asarray(keys1))
    F1.block_until_ready()
    print(f"lift cloud1: {time.time()-t0:.2f}s (cached)")

    @jax.jit
    def descriptors(F):
        out = part1.apply(p1_vars, F, False)
        return out["eqv"], out["inv"]

    eqv0, inv0 = descriptors(F0)
    eqv1, inv1 = descriptors(F1)

    match = jax.jit(mutual_match)(inv0, inv1)
    n_match = int(match.count)
    pairs = np.asarray(match.pairs)
    correct = (pairs[:n_match, 0] == pairs[:n_match, 1]).mean() if n_match else 0.0
    print(f"matches: {n_match}, identity-correct fraction: {correct:.3f}")

    # DR index per match: des_before = cloud1 side, des_after = cloud0 side
    @jax.jit
    def dr_of_matches(eqv0, eqv1, pairs):
        d1 = eqv1[pairs[:, 1]]
        d0 = eqv0[pairs[:, 0]]
        return des2dr(d1, d0)

    dr = dr_of_matches(eqv0, eqv1, match.pairs)
    dr_np = np.asarray(dr)[:n_match]
    frac_g = (dr_np == args.group_index).mean() if n_match else 0.0
    print(f"DR-index == {args.group_index}: {frac_g:.3f} of matches")

    res = jax.jit(
        lambda k: yoho_c_ransac(
            k,
            jnp.asarray(keys0),
            jnp.asarray(keys1),
            match.pairs,
            match.mask,
            dr,
            max_iter=args.max_iter,
            inlier_dist=cfg.ransac.inlier_dist_c,
        )
    )(jax.random.PRNGKey(42))
    T = np.asarray(res.transform)
    r_err = so3.compute_R_diff(R, T[:, :3])
    t_err = float(np.linalg.norm(T[:, 3] - t))
    print(
        f"RANSAC: overlap={float(res.overlap):.3f} R_err={r_err:.3f}deg "
        f"t_err={t_err:.4f}m degenerate={bool(res.degenerate)}"
    )
    if args.vis_dir:
        import os

        from yoho_tpu.utils.vis import draw_registration_result_with_keys

        os.makedirs(args.vis_dir, exist_ok=True)
        T4 = np.eye(4)
        T4[:3] = T
        out = draw_registration_result_with_keys(
            cloud1, cloud0, keys1, keys0, T4,
            out_ply=os.path.join(args.vis_dir, "registration.ply"),
            out_png=os.path.join(args.vis_dir, "registration.png"),
        )
        print(f"visualization: {out}")
    ok = r_err < 2.0 and t_err < 0.05 and correct > 0.8
    print("DEMO", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
