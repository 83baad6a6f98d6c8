"""RPN losses: alpha/beta-weighted binary CE + smooth L1 on positives.

Semantics follow the loss assembly inside the reference forward pass
(voxelnet/model.py:340-352) with two conscious corrections, both gated by
flags for bit-parity checks:

  * smooth-L1: the reference multiplies the two branch options together
    (voxelnet/loss.py:9-10); the correct form gates by the |diff| < 1/sigma^2
    sign. `buggy=True` reproduces the reference.
  * classification: by default computed from *logits* with stable
    log-sigmoid instead of the reference's log(sigmoid(x) + 1e-6).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def smooth_l1(deltas: jnp.ndarray, targets: jnp.ndarray,
              sigma: float = 3.0, buggy: bool = False) -> jnp.ndarray:
    """Elementwise smooth-L1 (Huber) with transition at |d| = 1/sigma^2."""
    sigma2 = sigma * sigma
    diffs = deltas - targets
    quad = 0.5 * sigma2 * diffs * diffs
    lin = jnp.abs(diffs) - 0.5 / sigma2
    if buggy:
        # reference voxelnet/loss.py:9-10
        sign = (jnp.abs(diffs) < 1.0 / sigma2).astype(diffs.dtype)
        return quad * lin + lin * (1.0 - sign)
    return jnp.where(jnp.abs(diffs) < 1.0 / sigma2, quad, lin)


class RPNLoss(NamedTuple):
    loss: jnp.ndarray
    cls_loss: jnp.ndarray
    reg_loss: jnp.ndarray
    cls_pos_loss: jnp.ndarray
    cls_neg_loss: jnp.ndarray


def rpn_loss(cls_out: jnp.ndarray, reg_out: jnp.ndarray,
             pos_mask: jnp.ndarray, neg_mask: jnp.ndarray,
             reg_targets: jnp.ndarray, *,
             alpha: float = 1.5, beta: float = 1.0, sigma: float = 3.0,
             from_logits: bool = True, buggy_smooth_l1: bool = False
             ) -> RPNLoss:
    """Assemble the RPN training loss.

    Args:
      cls_out: (B, H', W', 2) classification map — logits if `from_logits`
        else post-sigmoid probabilities.
      reg_out: (B, H', W', 14) regression map.
      pos_mask / neg_mask: (B, H', W', 2) 0/1 anchor assignment maps.
      reg_targets: (B, H', W', 14) encoded regression targets.

    Normalization matches voxelnet/model.py:314-350: positive and negative
    CE terms each divided by their per-sample assignment count (clipped to
    >= 1), regression by the positive count.
    """
    f32 = jnp.float32
    pos = pos_mask.astype(f32)
    neg = neg_mask.astype(f32)
    cls_out = cls_out.astype(f32)
    reg_out = reg_out.astype(f32)
    reg_targets = reg_targets.astype(f32)

    pos_sum = jnp.clip(pos.sum(axis=(1, 2, 3)), 1.0)[:, None, None, None]
    neg_sum = jnp.clip(neg.sum(axis=(1, 2, 3)), 1.0)[:, None, None, None]

    if from_logits:
        log_p = jax.nn.log_sigmoid(cls_out)
        log_not_p = jax.nn.log_sigmoid(-cls_out)
    else:
        log_p = jnp.log(cls_out + 1e-6)
        log_not_p = jnp.log(1.0 - cls_out + 1e-6)

    cls_pos = (-pos * log_p) / pos_sum
    cls_neg = (-neg * log_not_p) / neg_sum
    cls_loss = (alpha * cls_pos + beta * cls_neg).sum()

    # (B, H', W', 2) -> (B, H', W', 14) mask over the 7 regression channels
    # of each anchor (voxelnet/model.py:310-312).
    pos_reg = jnp.repeat(pos, 7, axis=-1)
    reg = smooth_l1(reg_out * pos_reg, reg_targets * pos_reg,
                    sigma=sigma, buggy=buggy_smooth_l1)
    reg_loss = (reg / pos_sum).sum()

    return RPNLoss(
        loss=cls_loss + reg_loss,
        cls_loss=cls_loss,
        reg_loss=reg_loss,
        cls_pos_loss=cls_pos.sum(),
        cls_neg_loss=cls_neg.sum(),
    )
