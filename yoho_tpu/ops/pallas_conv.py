"""Fused Pallas sparse-convolution kernel (gather -> MXU GEMM -> accumulate).

TPU-native replacement for MinkowskiEngine's gather-GEMM-scatter CUDA
hot loop (reference ``src/convolution_kernel.cu:115-180`` forward,
``:199-289`` fused backward). The XLA variants in ``sparse_conv.py``
materialize K gathered ``(M, Cin)`` operands in HBM per conv; this
kernel keeps the whole feature matrix VMEM-resident and performs, per
output tile, K in-VMEM dynamic row gathers each feeding one MXU matmul
into an accumulator — the gathered operands never touch HBM.

HBM traffic per conv drops from ~2*K*M*Cin*4 bytes (gather-out +
matmul-in) to ``N*Cin*4 + K*M*4 + M*Cout*4`` (features once, the index
map, the output).

Backward (``jax.custom_vjp``):
  * dW[k] = gather(feats, idx[k])^T @ gout — same fused structure, one
    revisited accumulator output over the M-tile grid.
  * dF: for a fixed offset k the map m -> in_idx[k, m] is a translation
    of coordinates and therefore injective over valid entries, so its
    inverse is again a gather map: invert each offset with one scatter
    (XLA), then dF = pallas_conv(gout, inv_map, W^T). Invalid taps are
    masked to zero *inside the kernel*, so the reserved pad row really
    receives zero gradient and the VJP is exact (gradcheck-tested)
    without relying on the zero-row invariant.

Falls back to the XLA paths (``sparse_conv.py``) when the feature
matrix would not fit in VMEM or M is not tile-aligned — the caller
(``sparse_conv(variant='pallas')``) handles that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM is ~16 MB/core; leave room for the weight block, index/output
# tiles and double-buffering.
VMEM_FEATS_BUDGET = 10 * 1024 * 1024
TILE_M = 512


def _interpret() -> bool:
    """Mosaic lowering needs a real TPU ('tpu' locally, 'axon' via the
    remote tunnel); everywhere else run the kernel interpreted so tests
    exercise identical semantics on CPU."""
    return jax.default_backend() not in ("tpu", "axon")


def _fwd_kernel(idx_ref, val_ref, feats_ref, w_ref, out_ref):
    """One (TILE_M, Cout) output tile: sum_k mask(gather(F, idx[k])) @ W[k].

    ``val_ref`` is a float32 0/1 mask (bool VMEM blocks have weaker
    Mosaic layout support than 32-bit lanes)."""
    K = idx_ref.shape[0]
    f = feats_ref[:]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(K):
        rows = jnp.take(f, idx_ref[k, :], axis=0)  # VMEM dynamic gather
        rows = rows * val_ref[k, :][:, None]
        acc = acc + jnp.dot(rows, w_ref[k], preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _dw_kernel(idx_ref, val_ref, feats_ref, g_ref, dw_ref):
    """Accumulate dW[k] += gather(F, idx[k])^T @ gout over the M grid."""
    K = idx_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    f = feats_ref[:]
    g = g_ref[:]
    for k in range(K):
        rows = jnp.take(f, idx_ref[k, :], axis=0)
        rows = rows * val_ref[k, :][:, None]
        dw_ref[k, :, :] += jax.lax.dot_general(
            rows, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )


def _tile_m(M: int) -> int:
    t = min(TILE_M, M)
    while M % t:
        t //= 2
    return max(t, 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pallas_sparse_conv(feats, in_idx, valid, weights):
    """out[M, Cout] = sum_k where(valid[k], feats[in_idx[k]], 0) @ W[k].

    feats: (N, Cin) float32 — must fit in VMEM (caller-checked).
    in_idx: (K, M) int32 rows into feats.
    valid: (K, M) float32 0/1 mask.
    weights: (K, Cin, Cout) float32.
    """
    return _forward(feats, in_idx, valid, weights)


def _forward(feats, in_idx, valid, weights):
    K, M = in_idx.shape
    N, Cin = feats.shape
    Cout = weights.shape[2]
    tm = _tile_m(M)
    grid = (M // tm,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # feats, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole array
        ],
        out_specs=pl.BlockSpec((tm, Cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * M * Cin * Cout,
            bytes_accessed=N * Cin * 4 + 2 * K * M * 4 + M * Cout * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(in_idx, valid, feats, weights)


def _grad_w(feats, in_idx, valid, gout):
    K, M = in_idx.shape
    N, Cin = feats.shape
    Cout = gout.shape[1]
    tm = _tile_m(M)
    return pl.pallas_call(
        _dw_kernel,
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((K, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, Cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        # every grid step revisits the same (K, Cin, Cout) accumulator
        out_specs=pl.BlockSpec((K, Cin, Cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, Cin, Cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * M * Cin * Cout,
            bytes_accessed=N * Cin * 4 + 2 * K * M * 4 + M * Cout * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(in_idx, valid, feats, gout)


def invert_offset_maps(in_idx, valid, n_in):
    """Per-offset inverse gather maps: inv_idx[k, n] = the output row m
    with in_idx[k, m] == n (unique over valid entries — a translation),
    inv_valid[k, n] = such an m exists. One packed scatter per call."""
    K, M = in_idx.shape
    m_ids = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (K, M))
    flat = jnp.where(
        valid > 0, jnp.arange(K, dtype=jnp.int32)[:, None] * n_in + in_idx, K * n_in
    ).reshape(-1)
    packed = (
        jnp.zeros((K * n_in,), jnp.int32)
        .at[flat]
        .set((m_ids.reshape(-1) | (1 << 30)), mode="drop")
    ).reshape(K, n_in)
    inv_valid = packed >= (1 << 30)
    inv_idx = jnp.where(inv_valid, packed & ((1 << 30) - 1), 0)
    return inv_idx, inv_valid


def _fwd_rule(feats, in_idx, valid, weights):
    return _forward(feats, in_idx, valid, weights), (feats, in_idx, valid, weights)


def _bwd_rule(res, gout):
    feats, in_idx, valid, weights = res
    gout = gout.astype(jnp.float32)
    dW = _grad_w(feats, in_idx, valid, gout)
    inv_idx, inv_valid = invert_offset_maps(in_idx, valid, feats.shape[0])
    # dF[n] = sum_k gout[inv_idx[k, n]] @ W[k]^T — the same fused kernel
    dF = _forward(
        gout, inv_idx, inv_valid.astype(jnp.float32), jnp.swapaxes(weights, 1, 2)
    )
    return dF, None, None, dW


pallas_sparse_conv.defvjp(_fwd_rule, _bwd_rule)


def fits_vmem(feats_shape, idx_shape, w_shape) -> bool:
    """Whole-feature-matrix VMEM residency check for the fused kernel."""
    N, Cin = feats_shape
    K = idx_shape[0]
    Cout = w_shape[2]
    tm = _tile_m(idx_shape[1])
    feats_b = N * max(Cin, 8) * 4  # lane padding lower bound
    w_b = K * Cin * Cout * 4
    tiles_b = 2 * (2 * K * tm * 4 + tm * Cout * 4 + tm * Cin * 4)
    return feats_b + w_b + tiles_b <= VMEM_FEATS_BUDGET
