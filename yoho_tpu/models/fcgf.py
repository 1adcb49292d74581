"""FCGF sparse ResUNet backbone (flax), on the sorted voxel engine.

Re-implements the reference's ``ResUNetBN2C`` topology
(``/root/reference/fcgf_model/resunet.py:10-209``: 4 encoder levels
32/64/128/256 with stride-2 downsampling, post-norm residual blocks
(``fcgf_model/residual_block.py:9-53``), 3 transpose-conv decoder levels
with skip concatenation, 1x1 head, optional L2 feature normalization)
— but as a pure function of (features, UNetPlan) with masked batch
norm, so the whole network is one statically-shaped jitted program.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from yoho_tpu.config import BackboneConfig, register
from yoho_tpu.models.plan import UNetPlan
from yoho_tpu.ops.kernel_map import KernelMap
from yoho_tpu.ops.sparse_conv import batch_norm_apply, masked_mean_var, sparse_conv
from yoho_tpu.utils.so3 import safe_l2_normalize


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid sparse rows only, with running stats.

    torch momentum m (reference bn_momentum=0.05, YOHO_testset.py:126)
    maps to ``new = (1-m)*old + m*batch``.
    """

    features: int
    momentum: float = 0.05
    eps: float = 1e-5

    @nn.compact
    def __call__(self, feats, mask, train: bool):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        offset = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        if train:
            mean, var = masked_mean_var(feats, mask)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value
        # Re-zero padding rows: BN's offset would otherwise leak onto
        # them, breaking the zero-row invariant the maskless conv
        # gathers rely on (see ops/kernel_map.py).
        out = batch_norm_apply(feats, mean, var, scale, offset, self.eps)
        return out * mask[:, None]


class MaskedInstanceNorm(nn.Module):
    """Instance norm on sparse rows: per-(batch-instance, channel)
    statistics via segment sums over the batch coordinate (the TPU
    analog of ME's MinkowskiInstanceNorm, which normalizes per batch
    item via global pooling + broadcast)."""

    features: int
    num_instances: int = 64
    eps: float = 1e-5

    @nn.compact
    def __call__(self, feats, batch_ids, mask, train: bool):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        offset = self.param("bias", nn.initializers.zeros, (self.features,))
        nb = self.num_instances
        b = jnp.where(mask, batch_ids, nb).astype(jnp.int32)
        # segment stats in f32 (bf16 segment sums would lose precision)
        fm = jnp.where(mask[:, None], feats, 0.0).astype(jnp.float32)
        ssum = jnp.zeros((nb + 1, self.features), jnp.float32).at[b].add(fm)
        s2um = jnp.zeros((nb + 1, self.features), jnp.float32).at[b].add(fm * fm)
        cnt = jnp.zeros((nb + 1,), jnp.float32).at[b].add(mask.astype(jnp.float32))
        denom = jnp.maximum(cnt, 1.0)[:, None]
        mean = ssum / denom
        var = jnp.maximum(s2um / denom - mean * mean, 0.0)
        mu = mean[jnp.clip(b, 0, nb - 1)]
        v = var[jnp.clip(b, 0, nb - 1)]
        out = (fm - mu) * jax.lax.rsqrt(v + self.eps) * scale[None, :] + offset[None, :]
        return out.astype(feats.dtype) * mask[:, None]


def apply_norm(
    norm_type: str,
    features: int,
    bn_momentum: float,
    max_instances: int,
    feats,
    grid,
    mask,
    train: bool,
):
    """Reference ``get_norm`` dispatch (``fcgf_model/common.py:4-10``),
    plus 'none' for the norm-free base variants. Must be called inside
    an ``nn.compact`` scope."""
    if norm_type in (None, "none", "None"):
        return feats * mask[:, None]
    if norm_type == "BN":
        return MaskedBatchNorm(features, bn_momentum)(feats, mask, train)
    if norm_type == "IN":
        return MaskedInstanceNorm(features, max_instances)(
            feats, grid.coords[:, 0], mask, train
        )
    raise ValueError(f"unknown norm type {norm_type!r}")


class SparseConv(nn.Module):
    """One sparse conv layer; kernel map supplied per call.

    Defaults to the maskless 'unrolled' variant (fastest measured on
    v5e: K monotone gathers + K MXU matmuls) — safe here because the
    surrounding model maintains the zero-row invariant.
    """

    in_features: int
    out_features: int
    kernel_volume: int  # K = kernel_size**3
    use_bias: bool = False
    variant: str = "unrolled"

    @nn.compact
    def __call__(self, feats, kmap: KernelMap):
        # Kaiming-style fan-in init over the full K*Cin receptive field,
        # matching ME's kernel init scale (MinkowskiConvolution.py reset).
        fan_in = self.kernel_volume * self.in_features
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (self.kernel_volume * self.in_features, self.out_features),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_features,))
            if self.use_bias
            else None
        )
        w3 = w.reshape(self.kernel_volume, self.in_features, self.out_features)
        return sparse_conv(feats, kmap, w3, b, variant=self.variant)


class ResidualBlock(nn.Module):
    """conv3->norm->relu->conv3->norm (+x) ->relu, post-norm
    (reference ``residual_block.py:37-53``); in==out channels here
    (FCGF never uses a downsample branch in its blocks). norm_type
    mirrors BLOCK_NORM_TYPE ('BN' everywhere except the IN2 variants)."""

    features: int
    bn_momentum: float
    norm_type: str = "BN"
    max_instances: int = 64

    @nn.compact
    def __call__(self, feats, kmap, grid, mask, train: bool):
        out = SparseConv(self.features, self.features, 27)(feats, kmap)
        out = apply_norm(self.norm_type, self.features, self.bn_momentum,
                         self.max_instances, out, grid, mask, train)
        out = nn.relu(out)
        out = SparseConv(self.features, self.features, 27)(out, kmap)
        out = apply_norm(self.norm_type, self.features, self.bn_momentum,
                         self.max_instances, out, grid, mask, train)
        return nn.relu(out + feats)


@register("backbone", "ResUNetBN2C")
class SparseResUNet(nn.Module):
    """ResUNetBN2C by default; channels configurable to cover the
    reference's B/D/E variants (``fcgf_model/resunet.py:196-221``)."""

    cfg: BackboneConfig

    @nn.compact
    def __call__(self, feats: jnp.ndarray, plan: UNetPlan, train: bool = False):
        c = self.cfg
        ch = c.channels  # (32, 64, 128, 256)
        tr = c.tr_channels  # (64, 64, 64, 128)
        bm = c.bn_momentum
        K1 = c.conv1_kernel_size**3

        # Inference compute dtype (cfg.dtype, default float32): bf16
        # features halve the HBM traffic of the gather-bound convs and
        # the inter-layer elementwise round trips (docs/PERF.md names
        # this the top remaining lever). Params, norm statistics, and
        # matmul accumulation stay f32; training always runs f32.
        dt = jnp.float32 if train else jnp.dtype(c.dtype)

        # Zero-row invariant: every conv gathers padding rows (incl. the
        # reserved zero row) for its invalid kernel-map entries; they
        # must hold zeros on the way in. BN layers re-assert it.
        feats = feats.astype(dt) * plan.mask1[:, None]

        # ---- encoder ----
        out_s1 = SparseConv(c.in_channels, ch[0], K1)(feats, plan.conv1)
        if c.first_layer_double:
            # second 3^3 conv reusing the block map: receptive field 5
            # at zero extra kernel-map cost (see BackboneConfig).
            out_s1 = apply_norm(c.norm_type, ch[0], bm, c.max_instances, out_s1, plan.g1, plan.mask1, train)
            out_s1 = nn.relu(out_s1)
            out_s1 = SparseConv(ch[0], ch[0], 27)(out_s1, plan.b1)
        out_s1 = apply_norm(c.norm_type, ch[0], bm, c.max_instances, out_s1, plan.g1, plan.mask1, train)
        out_s1 = ResidualBlock(ch[0], bm, c.block_norm_type, c.max_instances)(out_s1, plan.b1, plan.g1, plan.mask1, train)
        out = nn.relu(out_s1)

        out_s2 = SparseConv(ch[0], ch[1], 27)(out, plan.down2)
        out_s2 = apply_norm(c.norm_type, ch[1], bm, c.max_instances, out_s2, plan.g2, plan.mask2, train)
        out_s2 = ResidualBlock(ch[1], bm, c.block_norm_type, c.max_instances)(out_s2, plan.b2, plan.g2, plan.mask2, train)
        out = nn.relu(out_s2)

        out_s4 = SparseConv(ch[1], ch[2], 27)(out, plan.down3)
        out_s4 = apply_norm(c.norm_type, ch[2], bm, c.max_instances, out_s4, plan.g4, plan.mask4, train)
        out_s4 = ResidualBlock(ch[2], bm, c.block_norm_type, c.max_instances)(out_s4, plan.b4_g4, plan.g4, plan.mask4, train)
        out = nn.relu(out_s4)

        out_s8 = SparseConv(ch[2], ch[3], 27)(out, plan.down4)
        out_s8 = apply_norm(c.norm_type, ch[3], bm, c.max_instances, out_s8, plan.g8, plan.mask8, train)
        out_s8 = ResidualBlock(ch[3], bm, c.block_norm_type, c.max_instances)(out_s8, plan.b4_g8, plan.g8, plan.mask8, train)
        out = nn.relu(out_s8)

        # ---- decoder ----
        out = SparseConv(ch[3], tr[3], 27)(out, plan.up4)
        out = apply_norm(c.norm_type, tr[3], bm, c.max_instances, out, plan.g4, plan.mask4, train)
        out = ResidualBlock(tr[3], bm, c.block_norm_type, c.max_instances)(out, plan.b4_g4, plan.g4, plan.mask4, train)
        out = nn.relu(out)

        out = jnp.concatenate([out, out_s4], axis=1)
        out = SparseConv(ch[2] + tr[3], tr[2], 27)(out, plan.up3)
        out = apply_norm(c.norm_type, tr[2], bm, c.max_instances, out, plan.g2, plan.mask2, train)
        out = ResidualBlock(tr[2], bm, c.block_norm_type, c.max_instances)(out, plan.b2, plan.g2, plan.mask2, train)
        out = nn.relu(out)

        out = jnp.concatenate([out, out_s2], axis=1)
        out = SparseConv(ch[1] + tr[2], tr[1], 27)(out, plan.up2)
        out = apply_norm(c.norm_type, tr[1], bm, c.max_instances, out, plan.g1, plan.mask1, train)
        out = ResidualBlock(tr[1], bm, c.block_norm_type, c.max_instances)(out, plan.b1, plan.g1, plan.mask1, train)
        out = nn.relu(out)

        out = jnp.concatenate([out, out_s1], axis=1)
        # conv1_tr: 1x1 conv = plain dense matmul (kernel volume 1)
        out = nn.Dense(tr[0], use_bias=False, name="conv1_tr")(out)
        out = nn.relu(out)
        out = nn.Dense(c.out_channels, use_bias=True, name="final")(out)

        if c.normalize_feature:
            out = safe_l2_normalize(out, axis=1, eps=1e-6)
        # zero out padding rows so downstream gathers read clean data
        return out * plan.mask1[:, None]
