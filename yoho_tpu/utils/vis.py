"""Registration visualization (reference ``utils/utils_o3d.py:8-35``).

The reference pops open3d windows (``draw_registration_result`` /
``draw_registration_result_with_keys``); on a headless TPU host the
equivalents render to files instead: a colored PLY of the registered
pair (yellow source / cyan target, the reference's palette) and an
optional matplotlib PNG scatter. No open3d dependency.
"""

from __future__ import annotations

import numpy as np

SOURCE_COLOR = (1.0, 0.706, 0.0)  # yellow (utils_o3d.py:14)
TARGET_COLOR = (0.0, 0.651, 0.929)  # cyan (utils_o3d.py:15)
KEY_COLOR = (1.0, 0.0, 0.0)


def _apply(points: np.ndarray, transform: np.ndarray | None) -> np.ndarray:
    if transform is None:
        return np.asarray(points, np.float64)
    T = np.asarray(transform, np.float64)
    R, t = T[:3, :3], T[:3, 3]
    return np.asarray(points, np.float64) @ R.T + t


def write_colored_ply(path: str, points: np.ndarray, colors: np.ndarray) -> None:
    """ASCII PLY with per-vertex uchar RGB."""
    points = np.asarray(points, np.float64)
    rgb = (np.clip(np.asarray(colors, np.float64), 0, 1) * 255).astype(np.uint8)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(points)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, c in zip(points, rgb):
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}\n")


def draw_registration_result(
    source: np.ndarray,
    target: np.ndarray,
    transform: np.ndarray | None = None,
    out_ply: str | None = None,
    out_png: str | None = None,
    keys_source: np.ndarray | None = None,
    keys_target: np.ndarray | None = None,
    max_points: int = 20000,
) -> dict:
    """Render the registered pair (source moved by ``transform`` onto
    target). With ``keys_*`` given this is the ``_with_keys`` variant:
    keypoints are drawn red on top. Returns {'ply': path?, 'png': path?}.
    """
    rng = np.random.default_rng(0)

    def sub(p):
        p = np.asarray(p)
        if len(p) > max_points:
            p = p[rng.choice(len(p), max_points, replace=False)]
        return p

    src = _apply(sub(source), transform)
    tgt = sub(np.asarray(target, np.float64))
    pts = [src, tgt]
    cols = [
        np.tile(SOURCE_COLOR, (len(src), 1)),
        np.tile(TARGET_COLOR, (len(tgt), 1)),
    ]
    if keys_source is not None:
        ks = _apply(np.asarray(keys_source), transform)
        pts.append(ks)
        cols.append(np.tile(KEY_COLOR, (len(ks), 1)))
    if keys_target is not None:
        pts.append(np.asarray(keys_target, np.float64))
        cols.append(np.tile(KEY_COLOR, (len(keys_target), 1)))
    allp = np.concatenate(pts)
    allc = np.concatenate(cols)

    out = {}
    if out_ply:
        write_colored_ply(out_ply, allp, allc)
        out["ply"] = out_ply
    if out_png:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(111, projection="3d")
        ax.scatter(*src.T, s=0.3, c=[SOURCE_COLOR], depthshade=False)
        ax.scatter(*tgt.T, s=0.3, c=[TARGET_COLOR], depthshade=False)
        if keys_source is not None:
            ks = _apply(np.asarray(keys_source), transform)
            ax.scatter(*ks.T, s=4.0, c=[KEY_COLOR], depthshade=False)
        ax.set_axis_off()
        fig.tight_layout()
        fig.savefig(out_png, dpi=120)
        plt.close(fig)
        out["png"] = out_png
    return out


def draw_registration_result_with_keys(
    source, target, keys_source, keys_target, transform=None, **kw
) -> dict:
    """Reference ``draw_registration_result_with_keys`` analog."""
    return draw_registration_result(
        source, target, transform,
        keys_source=keys_source, keys_target=keys_target, **kw,
    )
