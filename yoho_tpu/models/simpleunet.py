"""SimpleNet family: non-residual sparse U-Nets.

Registry-complete TPU equivalents of the reference's alternative
backbones (``/root/reference/fcgf_model/simpleunet.py:8-541``):
conv1 -> (L-1) stride-2 convs -> (L-1) transposed convs with skip
concatenation (pre-relu skips, matching the reference forward at
``simpleunet.py:97-133``), then a family-specific tail:

* SimpleNet/SimpleNet2 (``tail_style='head'``): kernel-3 conv1_tr ->
  norm -> relu -> 1x1 biased head to ``out_channels``
  (reference ``simpleunet.py:79-96,119-126``);
* SimpleNet3 (``tail_style='dense1x1'``): a single 1x1 biased conv to
  ``tr_channels[0]`` — no norm, no relu, no final head, and the output
  dim is ``tr_channels[0]``, NOT ``out_channels``
  (reference ``simpleunet.py:446-453,496-501``).

None/BN/IN norms. Runs on a generic ``LevelsPlan`` (``models/plan.py``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from yoho_tpu.models.fcgf import SparseConv, apply_norm
from yoho_tpu.models.plan import LevelsPlan
from yoho_tpu.utils.so3 import safe_l2_normalize


class SimpleUNet(nn.Module):
    """Generic SimpleNet: ``len(channels)`` levels (reference SimpleNet=3,
    SimpleNet2=4, SimpleNet3=5)."""

    in_channels: int = 1
    out_channels: int = 32
    channels: tuple = (32, 64, 128)
    tr_channels: tuple = (32, 32, 64)
    norm_type: str = "BN"
    conv1_kernel_size: int = 3
    bn_momentum: float = 0.05
    normalize_feature: bool = False
    max_instances: int = 64
    tail_style: str = "head"  # 'head' (SimpleNet/2) | 'dense1x1' (SimpleNet3)

    @property
    def num_levels(self) -> int:
        return len(self.channels)

    @nn.compact
    def __call__(self, feats: jnp.ndarray, plan: LevelsPlan, train: bool = False):
        ch, tr = self.channels, self.tr_channels
        L = len(ch)
        assert len(plan.grids) == L, (
            f"plan has {len(plan.grids)} levels, model needs {L} "
            "(build with build_levels_plan(grid, num_levels))"
        )
        norm = lambda c_, x, lv: apply_norm(
            self.norm_type, c_, self.bn_momentum, self.max_instances,
            x, plan.grids[lv], plan.masks[lv], train,
        )
        feats = feats * plan.masks[0][:, None]

        # encoder: conv1 (stride 1) then L-1 stride-2 convs; skips are
        # the POST-NORM PRE-RELU tensors (reference simpleunet.py:98-109)
        skips = []
        out = SparseConv(self.in_channels, ch[0], self.conv1_kernel_size ** 3)(
            feats, plan.conv1
        )
        out = norm(ch[0], out, 0)
        skips.append(out)
        out = nn.relu(out)
        for lv in range(1, L):
            out = SparseConv(ch[lv - 1], ch[lv], 27)(out, plan.downs[lv - 1])
            out = norm(ch[lv], out, lv)
            skips.append(out)
            out = nn.relu(out)

        # decoder: transposed convs + pre-relu skip cats, starting from
        # the post-relu deepest tensor (`out` as left by the encoder)
        for lv in range(L - 1, 0, -1):
            cin = (ch[lv] + tr[lv + 1]) if lv < L - 1 else ch[lv]
            out = SparseConv(cin, tr[lv], 27)(out, plan.ups[lv - 1])
            out = norm(tr[lv], out, lv - 1)
            out = nn.relu(out)
            out = jnp.concatenate([out, skips[lv - 1]], axis=1)

        if self.tail_style == "dense1x1":
            # SimpleNet3 family: one 1x1 biased conv to tr[0]; no norm,
            # no relu, no final head (reference simpleunet.py:496-501).
            out = nn.Dense(tr[0], use_bias=True, name="conv1_tr")(out)
        else:
            # conv1_tr: kernel-3 stride-1 conv on the full-res grid
            out = SparseConv(ch[0] + tr[1], tr[0], 27)(out, plan.b1)
            out = norm(tr[0], out, 0)
            out = nn.relu(out)
            out = nn.Dense(self.out_channels, use_bias=True, name="final")(out)

        if self.normalize_feature:
            out = safe_l2_normalize(out, axis=1, eps=1e-6)
        return out * plan.masks[0][:, None]


# Reference variant tables (simpleunet.py:8-541). Channel tuples drop the
# leading None of the torch tables.
SIMPLENET_VARIANTS = {
    "SimpleNet": dict(channels=(32, 64, 128), tr_channels=(32, 32, 64), norm_type="none"),
    "SimpleNetIN": dict(channels=(32, 64, 128), tr_channels=(32, 32, 64), norm_type="IN"),
    "SimpleNetBN": dict(channels=(32, 64, 128), tr_channels=(32, 32, 64), norm_type="BN"),
    "SimpleNetBNE": dict(channels=(16, 32, 32), tr_channels=(16, 16, 32), norm_type="BN"),
    "SimpleNetINE": dict(channels=(16, 32, 32), tr_channels=(16, 16, 32), norm_type="IN"),
    "SimpleNet2": dict(channels=(32, 64, 128, 256), tr_channels=(32, 32, 64, 64), norm_type="none"),
    "SimpleNetIN2": dict(channels=(32, 64, 128, 256), tr_channels=(32, 32, 64, 64), norm_type="IN"),
    "SimpleNetBN2": dict(channels=(32, 64, 128, 256), tr_channels=(32, 32, 64, 64), norm_type="BN"),
    "SimpleNetBN2B": dict(channels=(32, 64, 128, 256), tr_channels=(64, 64, 64, 64), norm_type="BN"),
    "SimpleNetBN2C": dict(channels=(32, 64, 128, 256), tr_channels=(32, 64, 64, 128), norm_type="BN"),
    "SimpleNetBN2D": dict(channels=(32, 64, 128, 256), tr_channels=(32, 64, 64, 128), norm_type="BN"),
    "SimpleNetBN2E": dict(channels=(16, 32, 64, 128), tr_channels=(16, 32, 32, 64), norm_type="BN"),
    "SimpleNetIN2E": dict(channels=(16, 32, 64, 128), tr_channels=(16, 32, 32, 64), norm_type="IN"),
    "SimpleNet3": dict(channels=(32, 64, 128, 256, 512), tr_channels=(32, 32, 64, 64, 128), norm_type="none", tail_style="dense1x1"),
    "SimpleNetIN3": dict(channels=(32, 64, 128, 256, 512), tr_channels=(32, 32, 64, 64, 128), norm_type="IN", tail_style="dense1x1"),
    "SimpleNetBN3": dict(channels=(32, 64, 128, 256, 512), tr_channels=(32, 32, 64, 64, 128), norm_type="BN", tail_style="dense1x1"),
    "SimpleNetBN3B": dict(channels=(32, 64, 128, 256, 512), tr_channels=(32, 64, 64, 64, 128), norm_type="BN", tail_style="dense1x1"),
    "SimpleNetBN3C": dict(channels=(32, 64, 128, 256, 512), tr_channels=(32, 32, 64, 128, 128), norm_type="BN", tail_style="dense1x1"),
    "SimpleNetBN3D": dict(channels=(32, 64, 128, 256, 512), tr_channels=(32, 64, 64, 128, 128), norm_type="BN", tail_style="dense1x1"),
    "SimpleNetBN3E": dict(channels=(16, 32, 64, 128, 256), tr_channels=(16, 32, 32, 64, 128), norm_type="BN", tail_style="dense1x1"),
    "SimpleNetIN3E": dict(channels=(16, 32, 64, 128, 256), tr_channels=(16, 32, 32, 64, 128), norm_type="IN", tail_style="dense1x1"),
}
