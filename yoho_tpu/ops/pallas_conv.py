"""Fused Pallas sparse-convolution kernel (gather -> MXU GEMM -> accumulate).

TPU-native replacement for MinkowskiEngine's gather-GEMM-scatter CUDA
hot loop (reference ``src/convolution_kernel.cu:115-180`` forward,
``:199-289`` fused backward). The XLA variants in ``sparse_conv.py``
materialize K gathered ``(M, Cin)`` operands in HBM per conv; this
kernel keeps the whole feature matrix VMEM-resident and performs, per
(output-tile, offset) grid step, an in-VMEM dynamic row gather feeding
one MXU matmul into a revisited accumulator tile — the gathered
operands never touch HBM, and the (K, Cin, Cout) weights stream through
VMEM one offset at a time, so weight size never limits eligibility.

HBM traffic per conv drops from ~2*K*M*Cin*4 bytes (gather-out +
matmul-in) to ``N*Cin*4 + 2*K*M*4 + M*Cout*4 + K*Cin*Cout*4`` (features
once, the index map, the output, the weights).

VMEM accounting (``fits_vmem``): Mosaic stores VMEM arrays in
(sublane, lane) = (8, 128) float32 tiles, so the resident feature
matrix costs ``N * roundup(Cin, 128) * 4`` bytes — a (N, 32) matrix
occupies 4x its logical size. Layers whose *lane-padded* features
exceed the budget fall back to the XLA path; with ResUNetBN2C shapes
that admits the channel>=128 mid layers (where most MXU FLOPs live)
and rejects the lane-padded 32/64-channel full-resolution layers.

Backward (``jax.custom_vjp``):
  * dW[k] = gather(feats, idx[k])^T @ gout — same fused structure, the
    (K, Cin, Cout) output revisited over the M-tile grid.
  * dF: for a fixed offset k the map m -> in_idx[k, m] is a translation
    of coordinates and therefore injective over valid entries, so its
    inverse is again a gather map: invert each offset with one scatter
    (XLA), then dF = pallas_conv(gout, inv_map, W^T). Invalid taps are
    masked to zero *inside the kernel*, so the reserved pad row really
    receives zero gradient and the VJP is exact (gradcheck-tested)
    without relying on the zero-row invariant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM is ~16 MB/core; leave room for index/weight/output tiles and
# double-buffering.
VMEM_FEATS_BUDGET = 12 * 1024 * 1024
TILE_M = 512
LANE = 128  # minor-dim lane width of a VMEM tile


def _interpret() -> bool:
    """Mosaic lowering needs a real TPU ('tpu' locally, 'axon' via the
    remote tunnel); everywhere else run the kernel interpreted so tests
    exercise identical semantics on CPU."""
    return jax.default_backend() not in ("tpu", "axon")


def _fwd_kernel(idx_ref, val_ref, feats_ref, w_ref, out_ref):
    """One (TILE_M, Cout) output tile x one offset k:
    out += mask(gather(F, idx[k])) @ W[k], accumulated over the k grid
    dim (``val_ref`` is a float32 0/1 mask — bool VMEM blocks have
    weaker Mosaic layout support than 32-bit lanes)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = jnp.take(feats_ref[:], idx_ref[0, :], axis=0)  # VMEM gather
    rows = rows * val_ref[0, :][:, None]
    out_ref[:] += jnp.dot(rows, w_ref[0], preferred_element_type=jnp.float32)


def _dw_kernel(idx_ref, val_ref, feats_ref, g_ref, dw_ref):
    """dW[k] += gather(F, idx[k])^T @ gout, accumulated over the M grid
    (M is the minor grid dim so the (1, Cin, Cout) output block stays
    resident)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    rows = jnp.take(feats_ref[:], idx_ref[0, :], axis=0)
    rows = rows * val_ref[0, :][:, None]
    dw_ref[0, :, :] += jax.lax.dot_general(
        rows, g_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _tile_m(M: int) -> int:
    t = min(TILE_M, M)
    while M % t:
        t //= 2
    return max(t, 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pallas_sparse_conv(feats, in_idx, valid, weights):
    """out[M, Cout] = sum_k where(valid[k], feats[in_idx[k]], 0) @ W[k].

    feats: (N, Cin) float32 — lane-padded size must fit in VMEM
      (caller-checked via ``fits_vmem``).
    in_idx: (K, M) int32 rows into feats.
    valid: (K, M) float32 0/1 mask.
    weights: (K, Cin, Cout) float32 (streamed one offset at a time).
    """
    return _forward(feats, in_idx, valid, weights)


def _forward(feats, in_idx, valid, weights):
    K, M = in_idx.shape
    N, Cin = feats.shape
    Cout = weights.shape[2]
    tm = _tile_m(M)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(M // tm, K),  # K minor: the out tile accumulates in VMEM
        in_specs=[
            pl.BlockSpec((1, tm), lambda i, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # feats, whole array
            pl.BlockSpec(
                (1, Cin, Cout), lambda i, k: (k, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tm, Cout), lambda i, k: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, Cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * M * Cin * Cout,
            bytes_accessed=N * Cin * 4 + 2 * K * M * 4 + M * Cout * 4
            + K * Cin * Cout * 4,
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
        grid=(K, M // tm),  # M minor: the dW[k] block accumulates in VMEM
        in_specs=[
            pl.BlockSpec((1, tm), lambda k, i: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda k, i: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, Cout), lambda k, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Cin, Cout), lambda k, i: (k, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((K, Cin, Cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * M * Cin * Cout,
            bytes_accessed=N * Cin * 4 + 2 * K * M * 4 + M * Cout * 4
            + K * Cin * Cout * 4,
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
    # dF[n] = sum_k gout[inv_idx[k, n]] @ W[k]^T — the same fused kernel,
    # with gout as the resident matrix. Its lane-padded size can exceed
    # VMEM even when the forward's did not (e.g. decoder convs reading a
    # small coarse grid into a large fine one) -> XLA fallback there.
    wT = jnp.swapaxes(weights, 1, 2)
    if fits_vmem(gout.shape, inv_idx.shape, wT.shape):
        dF = _forward(gout, inv_idx, inv_valid.astype(jnp.float32), wT)
    else:
        K = in_idx.shape[0]
        g = jnp.take(gout, inv_idx.reshape(-1), axis=0)
        g = g.reshape(K, feats.shape[0], -1) * inv_valid[:, :, None]
        dF = jnp.einsum(
            "kno,kco->nc", g, weights, preferred_element_type=jnp.float32
        )
    return dF, None, None, dW


pallas_sparse_conv.defvjp(_fwd_rule, _bwd_rule)


def _lane_padded_bytes(n: int, c: int, itemsize: int = 4) -> int:
    """VMEM footprint of an (n, c) array: minor dim padded to 128 lanes."""
    lanes = -(-c // LANE) * LANE
    return n * lanes * itemsize


def fits_vmem(feats_shape, idx_shape, w_shape) -> bool:
    """Lane-padding-aware VMEM residency check for the fused kernel.

    Weights stream one (Cin, Cout) block at a time, so only the resident
    feature matrix plus the double-buffered per-step tiles count."""
    N, Cin = feats_shape
    K = idx_shape[0]
    Cout = w_shape[2]
    tm = _tile_m(idx_shape[1])
    feats_b = _lane_padded_bytes(N, Cin)
    # double-buffered per-grid-step blocks: idx + val tiles, one weight
    # block, the gathered rows, and the output tile
    step_b = 2 * (
        2 * _lane_padded_bytes(1, tm)  # idx + val (1, tm)
        + _lane_padded_bytes(Cin, Cout)  # W[k]
        + _lane_padded_bytes(tm, Cin)  # gathered rows
        + _lane_padded_bytes(tm, Cout)  # out tile
    )
    return feats_b + step_b <= VMEM_FEATS_BUDGET
