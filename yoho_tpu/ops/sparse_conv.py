"""Sparse convolution as gather + one MXU matmul (im2col over kernel maps).

TPU-native replacement for MinkowskiEngine's gather-GEMM-scatter CUDA
kernel (reference ``src/convolution_kernel.cu:115-180`` forward,
``:199-289`` backward). Because our kernel maps are *output-indexed*
(at most one input voxel per (output, offset) — see ``kernel_map.py``),
the conv is a pure gather followed by a single

    ``out[M, Cout] = im2col[M, K*Cin] @ W[K*Cin, Cout]``

matmul: no scatter in the forward pass, no atomics, bitwise
deterministic. The backward pass under ``jax.grad`` is a matmul plus a
segment scatter-add that XLA lowers efficiently.

A fused Pallas kernel (VMEM-resident features, in-kernel gather feeding
the MXU) was implemented, driven on the real chip, and removed: Mosaic's
gather lowering only supports full-shape ``take_along_axis`` row
permutations, not a (tile,)-row gather from a resident (N, Cin) matrix,
so the kernel cannot compile at any ResUNet layer shape; and honest
chained-scan measurements show all XLA variants within ~15% of each
other anyway (per-layer table in ``docs/PERF.md``,
``scripts/profile_conv3.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yoho_tpu.ops.kernel_map import KernelMap


import os


def sparse_conv(
    feats: jnp.ndarray,
    kmap: KernelMap,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    row_chunk: int = 4096,
    variant: str | None = None,
) -> jnp.ndarray:
    """Apply a sparse convolution.

    Args:
      feats: (N, Cin) input features; padding rows may hold garbage —
        they are masked via ``kmap.valid``.
      kmap: gather map (K, M) onto the output coordinate set.
      weights: (K, Cin, Cout).
      bias: optional (Cout,).
      row_chunk: output rows per im2col tile (im2col variant only).
      variant: 'im2col' (gather -> (M, K*Cin) @ (K*Cin, Cout)),
        'einsum' (gather -> kmc,kco->mo contraction, no relayout),
        'einsum_bf16' (same with bfloat16 operands, f32 accumulation),
        'unrolled' (K monotone gathers + K MXU matmuls, accumulated).
        An explicit per-call variant always wins; $YOHO_CONV_VARIANT
        (read per call, not at import) only fills in the default.
        A fused Pallas gather->GEMM kernel was built, measured, and
        removed: Mosaic cannot lower tiled row-gathers from a
        VMEM-resident matrix, and the XLA variants are within ~15% of
        each other at every ResUNet layer shape (docs/PERF.md).

    Returns:
      (M, Cout) output features (padding rows = bias or 0).
    """
    variant = variant or os.environ.get("YOHO_CONV_VARIANT") or "im2col"
    K, M = kmap.in_idx.shape
    Cin = feats.shape[1]

    if variant == "unrolled":
        # K per-offset gathers (each monotone over m -> page-friendly) +
        # K small MXU matmuls, accumulated. No (K, M, Cin) intermediate,
        # no relayout, NO gather-side mask: relies on the zero-row
        # invariant (kernel_map.py) — feats must be zero on the input
        # grid's reserved pad row. Gathers run at the FEATURE dtype
        # (bf16 features halve the HBM gather traffic that bounds these
        # convs, docs/PERF.md); accumulation stays f32 on the MXU.
        w = weights.astype(feats.dtype)
        out = jnp.zeros((M, weights.shape[2]), jnp.float32)
        for k in range(K):
            g = jnp.take(feats, kmap.in_idx[k], axis=0)
            out = out + jnp.dot(g, w[k], preferred_element_type=jnp.float32)
    elif variant == "einsum_nomask":
        g = jnp.take(feats, kmap.in_idx.reshape(-1), axis=0).reshape(K, M, Cin)
        out = jnp.einsum(
            "kmc,kco->mo", g, weights, preferred_element_type=jnp.float32
        )
    elif variant in ("einsum", "einsum_bf16"):
        dt = jnp.bfloat16 if variant == "einsum_bf16" else feats.dtype
        g = jnp.take(feats.astype(dt), kmap.in_idx.reshape(-1), axis=0)
        g = g.reshape(K, M, Cin)
        g = jnp.where(kmap.valid[:, :, None], g, jnp.zeros((), dt))
        out = jnp.einsum(
            "kmc,kco->mo", g, weights.astype(dt),
            preferred_element_type=jnp.float32,
        )
    else:
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
    # store at the feature dtype (f32 accumulation above): under a bf16
    # feature path this halves the inter-layer HBM round trips
    return out.astype(feats.dtype)


def masked_mean_var(
    feats: jnp.ndarray, mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel mean/var over valid rows only.

    The reference applies dense torch BatchNorm1d to the feature matrix
    (``MinkowskiNormalization.py``) — correct there because ME tensors
    carry no padding. With static padding, the statistics must exclude
    pad rows or they'd be batch-size dependent noise.
    """
    f32 = feats.astype(jnp.float32)  # stats in f32 under bf16 features
    m = mask.astype(jnp.float32)[:, None]
    n = jnp.maximum(m.sum(), 1.0)
    mean = (f32 * m).sum(axis=0) / n
    var = (jnp.square(f32 - mean[None, :]) * m).sum(axis=0) / n
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
    out = feats.astype(jnp.float32) * inv[None, :] + (offset - mean * inv)[None, :]
    return out.astype(feats.dtype)  # keep the caller's compute dtype
