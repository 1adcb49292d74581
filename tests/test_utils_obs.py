"""Observability + gradcheck utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from yoho_tpu.utils.gradcheck import gradcheck
from yoho_tpu.utils.observability import Logger, StageTimer, print_diagnostics


def test_stage_timer():
    t = StageTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["b"]["count"] == 1
    assert "a:" in str(t)


def test_logger(tmp_path):
    lg = Logger(str(tmp_path), tensorboard=False)
    lg.log({"loss": 1.5}, "train", 10)
    lg.log({"recall": 0.9}, "val", 10)
    lg.close()
    lines = (tmp_path / "scalars.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    assert (tmp_path / "train.txt").exists() and (tmp_path / "val.txt").exists()


def test_print_diagnostics(capsys):
    info = print_diagnostics()
    assert "jax" in info and "devices" in info


def test_gradcheck_sparse_conv(rng):
    from yoho_tpu.ops.kernel_map import build_kernel_map
    from yoho_tpu.ops.sparse_conv import sparse_conv
    from yoho_tpu.ops.voxel import build_grid

    cloud = rng.uniform(-0.5, 0.5, size=(200, 3)).astype(np.float32)
    pts = jnp.zeros((256, 3), jnp.float32).at[:200].set(jnp.asarray(cloud))
    grid, _ = build_grid(pts, 0.1, 200)
    kmap = build_kernel_map(grid, grid, 3)
    n = grid.coords.shape[0]
    mask = (np.arange(n) < int(grid.count)).astype(np.float32)[:, None]
    feats = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32) * mask)
    w = jnp.asarray(rng.normal(size=(27, 8, 4)).astype(np.float32) * 0.2)

    # check through the maskless fast path: grads must respect the
    # zero-row invariant (pad rows are re-masked by the wrapper)
    def f(feats, w):
        return sparse_conv(feats * jnp.asarray(mask), kmap, w, variant="unrolled")

    gradcheck(jax.jit(f), (feats, w), argnums=(0, 1))


def test_gradcheck_catches_wrong_grad(rng):
    import pytest

    @jax.custom_vjp
    def bad(x):
        return x * x

    def fwd(x):
        return bad(x), x

    def bwd(x, g):
        return (g * 3.0 * x,)  # wrong: should be 2x

    bad.defvjp(fwd, bwd)
    x = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) + 2.0)
    with pytest.raises(AssertionError):
        gradcheck(bad, (x,), argnums=0)
