"""uint8 input transport: device-side normalization parity.

The eval pipeline can upload raw uint8 level_0 images (4× fewer
host→device bytes — the largest per-map transfer) and normalize to
[-1, 1] on device (models/pipeline.py:_normalize). When the image needs
no resize, the device expression `2·x/255 − 1` is bit-identical to the
loader's host float32 path (data/base.py:image_pyramid), so the model
outputs must be exactly equal.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from tests.synthetic_scene import build_scene_dir


def test_uint8_level0_is_bitwise_equal(tmp_path):
    from itermvs_tpu.data import find_dataset_def
    from itermvs_tpu.models import Pipeline

    scene = str(tmp_path / "scene")
    os.makedirs(scene)
    build_scene_dir(scene, num_views=4, width=128, height=96,
                    write_gt_depth=False)
    make = find_dataset_def("custom")
    s_f32 = make(scene, 4, (128, 96))[0]
    s_u8 = make(scene, 4, (128, 96), uint8_level0=True)[0]

    lvl0 = s_u8["imgs"]["level_0"]
    assert lvl0.dtype == np.uint8
    # Host normalization of the uint8 plane reproduces the f32 plane.
    np.testing.assert_array_equal(
        2.0 * lvl0.astype(np.float32) / 255.0 - 1.0,
        s_f32["imgs"]["level_0"])

    model = Pipeline(iteration=2, test=True)
    projs = {k: jnp.asarray(v)[None]
             for k, v in s_f32["proj_matrices"].items()}
    dmin = jnp.asarray([s_f32["depth_min"]])
    dmax = jnp.asarray([s_f32["depth_max"]])
    imgs_f32 = {"level_0": jnp.asarray(s_f32["imgs"]["level_0"])[None]}
    imgs_u8 = {"level_0": jnp.asarray(lvl0)[None]}
    variables = model.init(jax.random.PRNGKey(0), imgs_f32, projs, dmin, dmax)

    out_f32 = model.apply(variables, imgs_f32, projs, dmin, dmax)
    out_u8 = model.apply(variables, imgs_u8, projs, dmin, dmax)
    for key in ("depths_upsampled", "confidence_upsampled"):
        np.testing.assert_array_equal(np.asarray(out_f32[key]),
                                      np.asarray(out_u8[key]))
