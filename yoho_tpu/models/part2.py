"""PartII: residual rotation regressor (flax).

Re-implements the reference PartII (``/root/reference/utils/network.py:
149-278``): concat of 4 aligned 32-channel group features -> Comb_Conv
128->256 -> Residual_Comb_Conv(256,512,256) -> 1x1 FC stack 256->512->
128->4 -> quaternion.

Faithful quirks, kept deliberately (cf. SURVEY.md §2.1 "PartII network"):

* the "0"-side features are aligned by the *predicted* coarse index via
  the Cayley permutation before concatenation
  (``utils/network.py:266-269``);
* the quaternion is read from group element 0, not the group mean —
  the reference's group-mean at ``:272`` is dead code. After alignment
  the g=0 slot corresponds to the anchor rotation, so this is a
  meaningful readout; a ``readout='mean'`` option is provided anyway;
* the test path L2-normalizes the quaternion, the train path does not
  (``:277`` vs ``:211``). Controlled by ``normalize``.

The FC stack is applied across all 60 group slots (so BatchNorm
statistics aggregate over (B, 60), matching torch BatchNorm2d on the
(B, C, 60, 1) tensor) and the result is sliced afterwards.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from yoho_tpu.config import PartIIConfig, register
from yoho_tpu.group import get_group
from yoho_tpu.models.part1 import CombConv, ResidualCombConv
from yoho_tpu.utils.so3 import safe_l2_normalize


def align_by_index(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Permute the group axis of (B, 60, C) by the Cayley row of idx (B,).

    Reference ``feats0[i] = feats0[i][:, R_index_permu[idx[i]]]``
    (``utils/network.py:266-269``).
    """
    cayley = jnp.asarray(get_group().cayley)
    perm = cayley[idx]  # (B, 60)
    return jnp.take_along_axis(feats, perm[:, :, None], axis=1)


@register("network", "PartII")
class PartIINetwork(nn.Module):
    cfg: PartIIConfig
    readout: str = "g0"  # 'g0' (reference-faithful) | 'mean'

    @nn.compact
    def __call__(
        self,
        before_eqv0: jnp.ndarray,  # (B, 60, 32) FCGF group feats, "after-rot" side
        before_eqv1: jnp.ndarray,  # (B, 60, 32) "before-rot" side
        after_eqv0: jnp.ndarray,  # (B, 60, 32) PartI eqv, "after-rot" side
        after_eqv1: jnp.ndarray,  # (B, 60, 32)
        pre_idx: jnp.ndarray,  # (B,) int32 coarse rotation index
        train: bool = False,
        normalize: bool = True,
    ) -> jnp.ndarray:
        c = self.cfg
        neighbors = jnp.asarray(get_group().neighbors)
        f0 = align_by_index(before_eqv0, pre_idx)
        a0 = align_by_index(after_eqv0, pre_idx)
        x = jnp.concatenate([f0, before_eqv1, a0, after_eqv1], axis=-1)  # (B,60,128)

        x = CombConv(c.in_dim, c.hidden_dim)(x, neighbors, train)  # Conv_init
        for _ in range(c.num_residual_blocks):
            x = ResidualCombConv(c.hidden_dim, c.middle_dim, c.hidden_dim)(
                x, neighbors, train
            )

        # FC stack over channels, BN over (B, 60) like torch BatchNorm2d.
        dims = c.fc_dims  # (256, 512, 128, 4)
        h = nn.Dense(dims[1])(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.Dense(dims[2])(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.Dense(dims[3])(h)  # (B, 60, 4)

        if self.readout == "mean":
            q = jnp.mean(h, axis=1)
        else:
            q = h[:, 0, :]
        if normalize:
            q = safe_l2_normalize(q, axis=-1, eps=1e-6)
        return q
