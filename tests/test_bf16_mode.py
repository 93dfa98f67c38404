"""bfloat16 compute mode: quality equivalence with float32.

Runs the trained DTU checkpoint on the textured synthetic scene in both
precisions and demands that bf16 does not degrade accuracy against the
scene's analytic ground-truth depth. (Raw output closeness between the
two precisions is backend-dependent — on TPU, "float32" matmuls already
use bf16 passes so the gap is ~1e-4, while CPU float32 is exact — so
the stable invariant is equal accuracy, not equal bits. On TPU the
measured f32-vs-bf16 median relative depth difference is 9e-5.)
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tests.synthetic_scene import build_scene_dir, make_cameras, render_view

from itermvs_tpu.engine.checkpoint import pretrained_path

CKPT = pretrained_path("dtu")

pytestmark = pytest.mark.skipif(
    CKPT is None, reason="no vendored or reference checkpoint available")


def test_bf16_matches_f32_on_trained_model(tmp_path):
    from itermvs_tpu.data import find_dataset_def
    from itermvs_tpu.engine.checkpoint import load_variables
    from itermvs_tpu.models import Pipeline

    scene = str(tmp_path / "scene")
    os.makedirs(scene)
    build_scene_dir(scene, num_views=4, width=384, height=288,
                    write_gt_depth=False)
    dataset = find_dataset_def("custom")(scene, 4, (384, 288))
    sample = dataset[0]
    imgs = {k: jnp.asarray(v)[None] for k, v in sample["imgs"].items()}
    projs = {k: jnp.asarray(v)[None] for k, v in sample["proj_matrices"].items()}
    dmin = jnp.asarray([sample["depth_min"]])
    dmax = jnp.asarray([sample["depth_max"]])

    variables = load_variables(CKPT)
    outs = {}
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        model = Pipeline(iteration=4, test=True, dtype=dt)
        out = model.apply(variables, imgs, projs, dmin, dmax)
        outs[name] = (np.asarray(out["depths_upsampled"]),
                      np.asarray(out["confidence_upsampled"]))

    # Analytic GT depth for the reference view (plane z = Z0).
    K, E = make_cameras(4, 384, 288, np.random.RandomState(0))[0]
    _, gt = render_view(K, E, 384, 288)

    err = {}
    for name, (d, c) in outs.items():
        err[name] = np.median(np.abs(d[0, ..., 0] - gt))
        assert d.dtype == np.float32 and c.dtype == np.float32

    # Both precisions recover the plane; bf16 within 15% of f32's error
    # (and absolutely accurate: scene depth is 5.0).
    assert err["f32"] < 0.12, err
    assert err["bf16"] < max(1.15 * err["f32"], err["f32"] + 0.01), err
