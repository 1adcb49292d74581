"""Headless registration visualization (yoho_tpu/utils/vis.py;
reference utils/utils_o3d.py:8-35)."""

import numpy as np

from yoho_tpu.utils.ply import read_ply
from yoho_tpu.utils.vis import draw_registration_result


def test_draw_registration_result_files(rng, tmp_path):
    src = rng.uniform(-1, 1, (500, 3))
    T = np.eye(4)
    T[:3, 3] = [0.1, 0, 0]
    tgt = src + [0.1, 0, 0]
    out = draw_registration_result(
        src, tgt, T,
        out_ply=str(tmp_path / "reg.ply"), out_png=str(tmp_path / "reg.png"),
        keys_source=src[:10],
    )
    pts = read_ply(out["ply"])
    assert len(pts) == 500 + 500 + 10
    # moved source must coincide with target
    np.testing.assert_allclose(
        np.sort(pts[:500], axis=0), np.sort(pts[500:1000], axis=0), atol=1e-5
    )
    import os
    assert os.path.getsize(out["png"]) > 1000
