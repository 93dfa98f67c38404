"""Multi-term IterMVS training loss (reference semantics: models/net.py:131-190).

All depth terms operate in normalized inverse-depth space. Components,
with per-prediction decay 0.8^(n−i−1):
  1. L1 ×256 on the initialization-sweep depth (level-2 GT);
  2. per GRU prediction: 256-bin cross-entropy vs the one-hot GT bin;
  3. (regress mode) windowed L1 ×256 where the GT bin falls within ±4
     bins of the predicted argmax (argmax stop-gradiented);
  4. (regress mode) confidence BCE-with-logits, GT = |err| < 0.002;
  5. L1 ×256 on the ×4-upsampled final depth (level-0 GT).

Masked reductions use sum/count with empty-mask guards (the reference
only guards the windowed term, net.py:177; we guard every term so the
jitted loss is total).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from itermvs_tpu.models.itermvs import NUM_BINS, RADIUS
from itermvs_tpu.ops.depth_range import depth_normalization


def _masked_mean(x, mask):
    count = jnp.sum(mask)
    return jnp.where(count > 0, jnp.sum(x * mask) / jnp.maximum(count, 1.0), 0.0)


def _bce_with_logits(logits, targets):
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def full_loss(outputs, depths_gt, masks, depth_min, depth_max, regress=True):
    """Args:
      outputs: Pipeline train-mode output dict (depths / depths_upsampled /
        confidences).
      depths_gt: dict level_0..3 of [B, H, W, 1] GT depth.
      masks: dict level_0..3 of [B, H, W, 1] validity (thresholded > 0.5).
      depth_min, depth_max: [B].
      regress: include windowed-regression + confidence terms (stage 2).

    Returns scalar loss.
    """
    batch = depth_min.shape[0]
    idmin = (1.0 / depth_min).reshape(batch, 1, 1, 1)
    idmax = (1.0 / depth_max).reshape(batch, 1, 1, 1)

    mask_0 = (masks["level_0"] > 0.5).astype(jnp.float32)
    mask_1 = (masks["level_2"] > 0.5).astype(jnp.float32)
    depth_gt_0 = depths_gt["level_0"]
    depth_gt_1 = depths_gt["level_2"]

    norm_gt = depth_normalization(depth_gt_1, idmin, idmax)        # [B,H,W,1]
    gt_index = jnp.clip(norm_gt, 0.0, 1.0) * (NUM_BINS - 1)
    gt_index = jnp.floor(gt_index * mask_1).astype(jnp.int32)      # [B,H,W,1]
    gt_one_hot = jax.nn.one_hot(gt_index[..., 0], NUM_BINS, dtype=jnp.float32)

    probabilities = outputs["depths"]["probability"]
    combines = outputs["depths"]["combine"]
    confidences = outputs["confidences"]
    num_prediction = len(combines)

    loss = 0.0

    # 1. Initialization sweep depth.
    init_norm = depth_normalization(outputs["depths"]["initial"][0], idmin, idmax)
    coeff = 0.8 ** num_prediction
    loss = loss + coeff * NUM_BINS * _masked_mean(jnp.abs(init_norm - norm_gt), mask_1)

    for i in range(num_prediction):
        coeff = 0.8 ** (num_prediction - i - 1)
        probability = jnp.clip(probabilities[i], min=1e-5)         # [B,H,W,256]
        ce = -jnp.sum(gt_one_hot * jnp.log(probability), axis=-1, keepdims=True)
        loss = loss + coeff * _masked_mean(ce, mask_1)

        if regress:
            pred_index = jax.lax.stop_gradient(
                jnp.argmax(probability, axis=-1, keepdims=True)).astype(jnp.int32)
            in_window = ((gt_index >= pred_index - RADIUS)
                         & (gt_index <= pred_index + RADIUS)).astype(jnp.float32)
            norm_depth = depth_normalization(combines[i], idmin, idmax)
            mask_new = mask_1 * in_window
            loss = loss + coeff * NUM_BINS * _masked_mean(
                jnp.abs(norm_depth - norm_gt), mask_new)

            conf_gt = (jnp.abs(jax.lax.stop_gradient(norm_depth) - norm_gt)
                       < 0.002).astype(jnp.float32)
            bce = _bce_with_logits(confidences[i], conf_gt)
            loss = loss + coeff * _masked_mean(bce, mask_1)

    # 5. Upsampled final depth at full crop resolution.
    norm_gt_0 = depth_normalization(depth_gt_0, idmin, idmax)
    norm_up = depth_normalization(outputs["depths_upsampled"][0], idmin, idmax)
    loss = loss + NUM_BINS * _masked_mean(jnp.abs(norm_up - norm_gt_0), mask_0)
    return loss
