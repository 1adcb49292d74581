"""Fused Pallas sparse conv vs the XLA variants: forward parity and
custom-VJP correctness (CPU interpret mode; the same kernel code is
Mosaic-compiled on TPU).

Reference analog: ``MinkowskiEngine/tests/python/convolution.py`` runs
forward golden values + autograd gradcheck on the CUDA kernel
(``src/convolution_kernel.cu:115-289``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoho_tpu.ops.kernel_map import build_kernel_map
from yoho_tpu.ops.pallas_conv import invert_offset_maps
from yoho_tpu.ops.sparse_conv import sparse_conv
from yoho_tpu.ops.voxel import build_grid, stride_grid


def _grid(rng, n=150, pad=256, vs=0.1):
    cloud = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)
    pts = jnp.zeros((pad, 3), jnp.float32).at[:n].set(jnp.asarray(cloud))
    grid, _ = jax.jit(lambda p: build_grid(p, vs, n))(pts)
    return grid


@pytest.mark.parametrize("strided", [False, True])
def test_pallas_forward_matches_im2col(rng, strided):
    grid = _grid(rng)
    if strided:
        out_grid, _ = jax.jit(lambda g: stride_grid(g, 2))(grid)
    else:
        out_grid = grid
    kmap = jax.jit(lambda g, o: build_kernel_map(g, o, 3))(grid, out_grid)
    Cin, Cout = 8, 16
    feats = rng.normal(size=(grid.coords.shape[0], Cin)).astype(np.float32)
    feats[-1] = 0  # zero-row invariant (im2col masks anyway)
    W = rng.normal(size=(27, Cin, Cout)).astype(np.float32)
    b = rng.normal(size=(Cout,)).astype(np.float32)
    ref = sparse_conv(jnp.asarray(feats), kmap, jnp.asarray(W), jnp.asarray(b))
    out = sparse_conv(
        jnp.asarray(feats), kmap, jnp.asarray(W), jnp.asarray(b), variant="pallas"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_vjp_matches_autograd(rng):
    """The custom VJP (dW Pallas kernel + inverse-map dF) must equal
    XLA autograd through the masked im2col formulation."""
    grid = _grid(rng, n=100)
    kmap = jax.jit(lambda g: build_kernel_map(g, g, 3))(grid)
    Cin, Cout = 4, 4
    feats = jnp.asarray(rng.normal(size=(grid.coords.shape[0], Cin)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(27, Cin, Cout)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(grid.coords.shape[0], Cout)), jnp.float32)

    def loss(variant):
        def f(feats, W):
            return jnp.sum(sparse_conv(feats, kmap, W, variant=variant) * cot)

        return jax.grad(f, argnums=(0, 1))(feats, W)

    dF_ref, dW_ref = loss("im2col")
    dF, dW = loss("pallas")
    np.testing.assert_allclose(np.asarray(dW), np.asarray(dW_ref), rtol=1e-4, atol=1e-4)
    # im2col autograd scatters cotangent mass into the reserved pad row
    # through masked-out gathers' zero contributions — both give 0 there;
    # compare valid rows and the pad row explicitly.
    np.testing.assert_allclose(np.asarray(dF), np.asarray(dF_ref), rtol=1e-4, atol=1e-4)


def test_invert_offset_maps_roundtrip(rng):
    grid = _grid(rng)
    kmap = jax.jit(lambda g: build_kernel_map(g, g, 3))(grid)
    n = grid.coords.shape[0]
    inv_idx, inv_valid = jax.jit(lambda k, v: invert_offset_maps(k, v, n))(
        kmap.in_idx, kmap.valid
    )
    in_idx = np.asarray(kmap.in_idx)
    valid = np.asarray(kmap.valid)
    ii, iv = np.asarray(inv_idx), np.asarray(inv_valid)
    K, M = in_idx.shape
    for k in range(0, K, 7):
        for m in range(0, M, 37):
            if valid[k, m]:
                assert iv[k, in_idx[k, m]]
                assert ii[k, in_idx[k, m]] == m
    # every valid inverse entry round-trips too
    for k in range(0, K, 9):
        for nrow in range(0, n, 41):
            if iv[k, nrow]:
                assert valid[k, ii[k, nrow]]
                assert in_idx[k, ii[k, nrow]] == nrow
