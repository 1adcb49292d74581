"""PartI: icosahedral-equivariant descriptor network (flax).

Re-implements the reference PartI
(``/root/reference/utils/network.py:12-147``): Conv_in 32->256 (plain
1x13 group conv), one Residual_Comb_Conv(256, 512, 256), Comb_Conv
256->32 head, input residual, group-mean invariant readout, per-(b,g)
L2 normalization of both outputs — plus ``Des2DR`` rotation-index
prediction via the Cayley-permuted correlation
(``utils/network.py:115-118``).

Layout: (B, G=60, C); the reference uses (B, C, G).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from yoho_tpu.config import PartIConfig, register
from yoho_tpu.group import get_group
from yoho_tpu.ops.group_conv import comb_conv_apply
from yoho_tpu.utils.so3 import safe_l2_normalize


class CombConv(nn.Module):
    """[BN -> ReLU ->] 1x13 group conv (reference Comb_Conv,
    ``utils/network.py:12-21``; bias on, torch Conv2d default)."""

    in_features: int
    out_features: int
    pre_bn_relu: bool = True

    @nn.compact
    def __call__(self, x, neighbors, train: bool):
        dt = x.dtype  # preserve the caller's compute dtype through BN
        if self.pre_bn_relu:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
            x = nn.relu(x).astype(dt)
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (13 * self.in_features, self.out_features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_features,))
        return comb_conv_apply(x, neighbors, w, b)


class ResidualCombConv(nn.Module):
    """Reference Residual_Comb_Conv (``utils/network.py:23-65``)."""

    in_features: int
    middle_features: int
    out_features: int

    @nn.compact
    def __call__(self, x, neighbors, train: bool):
        h = CombConv(self.in_features, self.middle_features)(x, neighbors, train)
        h = CombConv(self.middle_features, self.out_features)(h, neighbors, train)
        if self.in_features != self.out_features:
            sc = CombConv(self.in_features, self.out_features)(x, neighbors, train)
        else:
            sc = x
        return h + sc


@register("network", "PartI")
class PartINetwork(nn.Module):
    cfg: PartIConfig

    def setup(self):
        self.neighbors = jnp.asarray(get_group().neighbors)
        c = self.cfg
        self.conv_in = CombConv(c.in_dim, c.hidden_dim, pre_bn_relu=False)
        self.blocks = [
            ResidualCombConv(c.hidden_dim, c.middle_dim, c.hidden_dim)
            for _ in range(c.num_residual_blocks)
        ]
        self.conv_out = CombConv(c.hidden_dim, c.out_dim)

    def __call__(self, feats: jnp.ndarray, train: bool = False):
        """feats (B, 60, 32) -> {'inv': (B, 32), 'eqv': (B, 60, 32)}."""
        # Inference compute dtype (cfg.dtype, default f32): the group
        # convs are one big MXU matmul each — bf16 operands double MXU
        # throughput; accumulation and the normalized outputs stay f32.
        dt = jnp.float32 if train else jnp.dtype(
            getattr(self.cfg, "dtype", "float32")
        )
        feats = feats.astype(dt)
        x = self.conv_in(feats, self.neighbors, train)
        for blk in self.blocks:
            x = blk(x, self.neighbors, train)
        x = self.conv_out(x, self.neighbors, train)
        eqv = (x + feats).astype(jnp.float32)  # reference: SO3_Conv(feats) + feats
        inv = jnp.mean(eqv, axis=1)  # group mean
        # L2 normalize over channels (reference clamps the norm at 1e-4)
        eqv = safe_l2_normalize(eqv, axis=-1, eps=1e-4)
        inv = safe_l2_normalize(inv, axis=-1, eps=1e-4)
        return {"inv": inv, "eqv": eqv}


def des2dr(des_before: jnp.ndarray, des_after: jnp.ndarray) -> jnp.ndarray:
    """Coarse rotation index from a pair of equivariant descriptors.

    Reference ``Des2DR``/``Batch_Des2R_torch``
    (``utils/network.py:115-118``, ``tests/extractor.py:74-78``):
    score[b, a] = <perm_a(des_before[b]), des_after[b]> with
    perm_a = cayley row a; returns argmax index (B,).

    In (B, G, C) layout: cor[b, a] = sum_{g,c}
    des_before[b, cayley[a, g], c] * des_after[b, g, c].
    """
    cayley = jnp.asarray(get_group().cayley)
    permuted = jnp.take(des_before, cayley.reshape(-1), axis=1)  # (B, 3600, C)
    B, _, C = des_before.shape
    permuted = permuted.reshape(B, 60, 60, C)
    cor = jnp.einsum("bagc,bgc->ba", permuted, des_after)
    return jnp.argmax(cor, axis=1).astype(jnp.int32)
