import numpy as np
import jax.numpy as jnp
import pytest

from itermvs_tpu.ops import resize_bilinear, upsample_bilinear, resize_nearest

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("out_wh", [(5, 4), (20, 16), (3, 3), (80, 64)])
def test_bilinear_matches_cv2(rng, out_wh):
    img = rng.rand(8, 10, 3).astype(np.float32)
    ref = cv2.resize(img, out_wh, interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear(jnp.asarray(img), (out_wh[1], out_wh[0])))
    np.testing.assert_allclose(got, ref, atol=2e-6)


@pytest.mark.parametrize("scale", [2, 4])
def test_bilinear_matches_torch_interpolate(rng, scale):
    x = rng.rand(2, 7, 9, 5).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=scale, mode="bilinear"
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(upsample_bilinear(jnp.asarray(x), scale))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_bilinear_downsample_matches_torch(rng):
    x = rng.rand(1, 16, 20, 4).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=0.5, mode="bilinear"
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), (8, 10)))
    np.testing.assert_allclose(got, ref, atol=2e-6)


@pytest.mark.parametrize("out_wh", [(5, 4), (20, 16), (7, 5)])
def test_nearest_matches_cv2(rng, out_wh):
    img = rng.rand(8, 10, 1).astype(np.float32)
    ref = cv2.resize(img[..., 0], out_wh, interpolation=cv2.INTER_NEAREST)
    got = np.asarray(resize_nearest(jnp.asarray(img), (out_wh[1], out_wh[0])))[..., 0]
    np.testing.assert_array_equal(got, ref)
