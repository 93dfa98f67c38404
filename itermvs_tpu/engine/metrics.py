"""Depth metrics + epoch aggregation (reference: utils.py:103-155).

Metrics are computed per image over the valid mask, then averaged over
the batch — matching `compute_metrics_for_each_image`. All functions
take NHWC [B, H, W, 1] maps and return scalars (jnp), jit-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _per_image_masked_mean(values, mask):
    """[B, ...] masked mean per image → ([B] means, [B] has-valid flags)."""
    b = values.shape[0]
    v = values.reshape(b, -1)
    m = mask.reshape(b, -1)
    count = jnp.sum(m, axis=1)
    means = jnp.where(count > 0, jnp.sum(v * m, axis=1) / jnp.maximum(count, 1.0), 0.0)
    return means, (count > 0).astype(values.dtype)


def _batch_mean(per_image, has_valid):
    """Average per-image metrics over images that have any valid pixels.

    Images whose mask is entirely empty are excluded from the batch
    average — this is what makes mask-zeroed padding samples (the
    partial-final-val-batch path, train.py:pad_batch) metric-exact."""
    n = jnp.sum(has_valid)
    return jnp.where(n > 0, jnp.sum(per_image * has_valid) / jnp.maximum(n, 1.0), 0.0)


def abs_depth_error(depth_est, depth_gt, mask):
    """Mean |est − gt| over mask, averaged per image then over batch."""
    mask = (mask > 0.5).astype(depth_est.dtype)
    err = jnp.abs(depth_est - depth_gt)
    return _batch_mean(*_per_image_masked_mean(err, mask))


def threshold_metric(depth_est, depth_gt, mask, thres):
    """Fraction of masked pixels with |err| > thres (outlier rate)."""
    mask = (mask > 0.5).astype(depth_est.dtype)
    outlier = (jnp.abs(depth_est - depth_gt) > thres).astype(depth_est.dtype)
    return _batch_mean(*_per_image_masked_mean(outlier, mask))


def depth_metrics(depths_combine, depth_upsampled, depth_gt, mask, num_iters):
    """The reference's scalar set (train.py:226-241) as a flat dict."""
    gt_1, mask_1 = depth_gt["level_2"], mask["level_2"]
    gt_0, mask_0 = depth_gt["level_0"], mask["level_0"]
    out = {
        "abs_error_initial": abs_depth_error(depths_combine[0], gt_1, mask_1),
        "thres1mm_initial": threshold_metric(depths_combine[0], gt_1, mask_1, 1),
        "abs_error_final_full": abs_depth_error(depth_upsampled, gt_0, mask_0),
        "thres1mm_final_full": threshold_metric(depth_upsampled, gt_0, mask_0, 1),
        "thres2mm_final_full": threshold_metric(depth_upsampled, gt_0, mask_0, 2),
        "thres4mm_final_full": threshold_metric(depth_upsampled, gt_0, mask_0, 4),
        "thres8mm_final_full": threshold_metric(depth_upsampled, gt_0, mask_0, 8),
    }
    for j in range(1, num_iters + 1):
        out[f"thres1mm_gru_{j}"] = threshold_metric(depths_combine[j], gt_1, mask_1, 1)
        out[f"abs_error_gru_{j}"] = abs_depth_error(depths_combine[j], gt_1, mask_1)
    return out


class DictAverageMeter:
    """Running mean of scalar dicts (reference utils.py:103-122)."""

    def __init__(self):
        self.data: dict[str, float] = {}
        self.count = 0

    def update(self, new_input: dict, n: int = 1):
        self.count += n
        for k, v in new_input.items():
            v = float(v)
            self.data[k] = self.data.get(k, 0.0) + v * n

    def mean(self):
        return {k: v / self.count for k, v in self.data.items()}
