"""Loss parity: itermvs_tpu full_loss vs the reference torch loss.

Feeds both implementations identical fabricated train-mode predictions
(probability volumes, combined depths, confidence logits, initial
depth) and ground truth, covering regress on/off, boundary GT bins and
partial masks. The reference loss (models/net.py:131-190) is imported
from /root/reference purely as an oracle.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference unavailable")


def _fabricate(rng, batch=2, h4=16, w4=24, num_pred=3, dmin=2.0, dmax=10.0):
    h0, w0 = h4 * 4, w4 * 4
    logits = rng.rand(num_pred, batch, 256, h4, w4).astype(np.float32) * 5
    prob = np.exp(logits) / np.exp(logits).sum(axis=2, keepdims=True)
    combine = rng.uniform(dmin, dmax, (num_pred, batch, 1, h4, w4)).astype(np.float32)
    conf = (rng.rand(num_pred, batch, 1, h4, w4).astype(np.float32) * 4 - 2)
    initial = rng.uniform(dmin, dmax, (batch, 1, h4, w4)).astype(np.float32)
    upsampled = rng.uniform(dmin, dmax, (batch, 1, h0, w0)).astype(np.float32)
    # GT spans the full range incl. values outside [dmin, dmax] to hit
    # the clamped boundary bins; masks are partial.
    gt_2 = rng.uniform(dmin * 0.8, dmax * 1.2, (batch, 1, h4, w4)).astype(np.float32)
    gt_0 = rng.uniform(dmin, dmax, (batch, 1, h0, w0)).astype(np.float32)
    mask_2 = (rng.rand(batch, 1, h4, w4) > 0.3).astype(np.float32)
    mask_0 = (rng.rand(batch, 1, h0, w0) > 0.3).astype(np.float32)
    depth_min = np.full((batch,), dmin, np.float32)
    depth_max = np.full((batch,), dmax, np.float32)
    return dict(prob=prob, combine=combine, conf=conf, initial=initial,
                upsampled=upsampled, gt_2=gt_2, gt_0=gt_0, mask_2=mask_2,
                mask_0=mask_0, depth_min=depth_min, depth_max=depth_max)


def _reference_loss(f, regress):
    sys.path.insert(0, REFERENCE)
    try:
        from models.net import full_loss as torch_loss
    finally:
        sys.path.remove(REFERENCE)

    t = {k: torch.from_numpy(v) for k, v in f.items()}
    depths = {
        "probability": [t["prob"][i] for i in range(len(f["prob"]))],
        "combine": [t["combine"][i] for i in range(len(f["combine"]))],
        "initial": [t["initial"]],
    }
    confidences = [t["conf"][i] for i in range(len(f["conf"]))]
    out = torch_loss(
        depths, [t["upsampled"]], confidences,
        {"level_0": t["gt_0"], "level_2": t["gt_2"]},
        {"level_0": t["mask_0"], "level_2": t["mask_2"]},
        t["depth_min"], t["depth_max"], regress=regress)
    return float(out)


def _our_loss(f, regress):
    from itermvs_tpu.models.losses import full_loss

    def nhwc(x):
        return jnp.asarray(np.moveaxis(x, -3, -1))

    outputs = {
        "depths": {
            "probability": [nhwc(p) for p in f["prob"]],
            "combine": [nhwc(c) for c in f["combine"]],
            "initial": [nhwc(f["initial"])],
        },
        "confidences": [nhwc(c) for c in f["conf"]],
        "depths_upsampled": [nhwc(f["upsampled"])],
    }
    depths_gt = {"level_0": nhwc(f["gt_0"]), "level_2": nhwc(f["gt_2"])}
    masks = {"level_0": nhwc(f["mask_0"]), "level_2": nhwc(f["mask_2"])}
    out = full_loss(outputs, depths_gt, masks,
                    jnp.asarray(f["depth_min"]), jnp.asarray(f["depth_max"]),
                    regress=regress)
    return float(out)


@pytest.mark.parametrize("regress", [True, False])
def test_full_loss_matches_reference(rng, regress):
    f = _fabricate(rng)
    ref = _reference_loss(f, regress)
    got = _our_loss(f, regress)
    assert got == pytest.approx(ref, rel=2e-5), (got, ref)
