"""Training losses (reference ``/root/reference/train/loss_val.py``).

* PartI: batch-hard margin ranking on invariant descriptors
  (log-softmax distances, margin 0.3) + cross-entropy on the 60-way
  Cayley-correlation scores, combined as 5*inv + eqv
  (``loss_val.py:21-53``).
* PartII: SmoothL1 / MSE (sum reduction) on the quaternion
  (``loss_val.py:56-71``).
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.nn as jnn

from yoho_tpu.config import register
from yoho_tpu.group import get_group
from yoho_tpu.utils.so3 import safe_l2_normalize


def dr_correlation(eqv_before: jnp.ndarray, eqv_after: jnp.ndarray) -> jnp.ndarray:
    """(B, 60, C) x 2 -> (B, 60) correlation over Cayley permutations
    (shared by des2dr and the eqv loss; reference ``eqvloss``,
    ``loss_val.py:27-31``)."""
    cayley = jnp.asarray(get_group().cayley)
    B, G, C = eqv_before.shape
    permuted = jnp.take(eqv_before, cayley.reshape(-1), axis=1).reshape(B, G, G, C)
    return jnp.einsum("bagc,bgc->ba", permuted, eqv_after)


@register("loss", "batch_hard_rindex")
def batch_hard_rindex_loss(
    inv0: jnp.ndarray,  # (B, C)
    inv1: jnp.ndarray,  # (B, C)
    eqv0: jnp.ndarray,  # (B, 60, C) after-conv equivariant
    eqv1: jnp.ndarray,
    true_idx: jnp.ndarray,  # (B,) int
    margin: float = 0.3,
    inv_weight: float = 5.0,
) -> tuple[jnp.ndarray, dict]:
    """Reference ``Batch_hard_Rindex_loss.__call__`` (loss_val.py:34-53)."""
    B = inv0.shape[0]
    d = jnp.sum(jnp.square(inv0[:, None, :] - inv1[None, :, :]), axis=-1)  # (B, B)
    logd = jnn.log_softmax(d, axis=1)
    loss_true = jnp.diagonal(logd)
    # hardest negative: min over the row with the diagonal pushed up by +1
    loss_false = jnp.min(logd + jnp.eye(B), axis=1)
    inv_loss = jnp.mean(jnp.clip(loss_true - loss_false + margin, min=0.0))

    score = dr_correlation(eqv0, eqv1)  # (B, 60)
    eqv_loss = jnp.mean(
        -jnp.take_along_axis(jnn.log_softmax(score, axis=1), true_idx[:, None], axis=1)
    )
    total = inv_weight * inv_loss + eqv_loss
    pred = jnp.argmax(score, axis=1)
    aux = {
        "inv_loss": inv_loss,
        "eqv_loss": eqv_loss,
        "dr_acc": jnp.mean((pred == true_idx).astype(jnp.float32)),
    }
    return total, aux


@register("loss", "smooth_l1")
def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch SmoothL1Loss(reduction='sum'), beta=1 (loss_val.py:56-62)."""
    diff = jnp.abs(pred - target)
    return jnp.sum(jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5))


@register("loss", "l2_sum")
def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.square(pred - target))


def quaternion_angular_error_deg(q_pred: jnp.ndarray, q_gt: jnp.ndarray) -> jnp.ndarray:
    """Validation metric (reference ``Validation_PartII.diff_cal``,
    loss_val.py:147-156): angle between unit quaternions, degrees."""
    q = safe_l2_normalize(q_pred, axis=-1, eps=1e-4)
    loss_q = jnp.clip(1.0 - jnp.sum(q * q_gt, axis=-1) ** 2, min=1e-7)
    return jnp.degrees(jnp.arccos(1 - 2 * loss_q))
