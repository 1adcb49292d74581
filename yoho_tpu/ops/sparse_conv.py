"""Sparse convolution as gather + one MXU matmul (im2col over kernel maps).

TPU-native replacement for MinkowskiEngine's gather-GEMM-scatter CUDA
kernel (reference ``src/convolution_kernel.cu:115-180`` forward,
``:199-289`` backward). Because our kernel maps are *output-indexed*
(at most one input voxel per (output, offset) — see ``kernel_map.py``),
the conv is a pure gather followed by a single

    ``out[M, Cout] = im2col[M, K*Cin] @ W[K*Cin, Cout]``

matmul: no scatter in the forward pass, no atomics, bitwise
deterministic. The backward pass under ``jax.grad`` is a matmul plus a
segment scatter-add that XLA lowers efficiently; a fused Pallas kernel
can replace both later without changing this interface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yoho_tpu.ops.kernel_map import KernelMap


def sparse_conv(
    feats: jnp.ndarray,
    kmap: KernelMap,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    row_chunk: int = 4096,
) -> jnp.ndarray:
    """Apply a sparse convolution.

    Args:
      feats: (N, Cin) input features; padding rows may hold garbage —
        they are masked via ``kmap.valid``.
      kmap: gather map (K, M) onto the output coordinate set.
      weights: (K, Cin, Cout).
      bias: optional (Cout,).
      row_chunk: output rows per im2col tile. The (rows, K*Cin) im2col
        buffer is the peak-memory term (e.g. 27*256 contraction at
        M=32k would be ~900 MB un-chunked); chunking bounds it while
        keeping the single big-contraction MXU matmul per tile.

    Returns:
      (M, Cout) output features (padding rows = bias or 0).
    """
    K, M = kmap.in_idx.shape
    Cin = feats.shape[1]
    w2 = weights.reshape(K * Cin, -1)

    def tile(args):
        idx, valid = args  # (K, rc)
        rc = idx.shape[1]
        g = jnp.take(feats, idx.reshape(-1), axis=0).reshape(K, rc, Cin)
        g = jnp.where(valid[:, :, None], g, 0.0)
        return g.transpose(1, 0, 2).reshape(rc, K * Cin) @ w2

    if M <= row_chunk or M % row_chunk != 0:
        out = tile((kmap.in_idx, kmap.valid))
    else:
        n_chunks = M // row_chunk
        idx_t = kmap.in_idx.reshape(K, n_chunks, row_chunk).transpose(1, 0, 2)
        val_t = kmap.valid.reshape(K, n_chunks, row_chunk).transpose(1, 0, 2)
        out = jax.lax.map(tile, (idx_t, val_t)).reshape(M, -1)
    if bias is not None:
        out = out + bias[None, :]
    return out


def masked_mean_var(
    feats: jnp.ndarray, mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel mean/var over valid rows only.

    The reference applies dense torch BatchNorm1d to the feature matrix
    (``MinkowskiNormalization.py``) — correct there because ME tensors
    carry no padding. With static padding, the statistics must exclude
    pad rows or they'd be batch-size dependent noise.
    """
    m = mask.astype(feats.dtype)[:, None]
    n = jnp.maximum(m.sum(), 1.0)
    mean = (feats * m).sum(axis=0) / n
    var = (jnp.square(feats - mean[None, :]) * m).sum(axis=0) / n
    return mean, var


def batch_norm_apply(
    feats: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    scale: jnp.ndarray,
    offset: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    inv = scale / jnp.sqrt(var + eps)
    return feats * inv[None, :] + (offset - mean * inv)[None, :]
