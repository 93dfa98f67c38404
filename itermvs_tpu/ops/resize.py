"""Exact-parity image resizing, NHWC, TPU-friendly.

Bilinear resampling uses the half-pixel convention
`src = clip((dst + 0.5) * in/out − 0.5, 0, ·)` with edge-clamped upper
neighbor — empirically bit-matched to BOTH `cv2.resize(INTER_LINEAR)`
and `torch.nn.functional.interpolate(mode='bilinear',
align_corners=False)` (the reference relies on both: cv2 in the
loaders, e.g. datasets/dtu_yao.py:71-76, F.interpolate throughout
models/itermvs.py). Nearest matches cv2.INTER_NEAREST
(`src = floor(dst * in/out)`), used for GT depth/mask pyramids
(datasets/dtu_yao.py:113-115).

Instead of gathers, the separable bilinear resample is expressed as two
dense interpolation-matrix contractions (out = A_h · x · A_wᵀ): these
land on the MXU and fuse well under XLA, and the matrices are
compile-time constants for static shapes.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out_size, in_size] half-pixel bilinear interpolation matrix."""
    scale = in_size / out_size
    src = np.maximum((np.arange(out_size) + 0.5) * scale - 0.5, 0.0)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    mat[np.arange(out_size), lo] += 1.0 - w_hi
    mat[np.arange(out_size), hi] += w_hi
    return mat


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC / ...HWC) images to (H_out, W_out)."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    dtype = x.dtype
    a_h = jnp.asarray(_bilinear_matrix(h_in, h_out), dtype=dtype)
    a_w = jnp.asarray(_bilinear_matrix(w_in, w_out), dtype=dtype)
    # Contract H then W: x[..., H, W, C]
    # HIGHEST precision: the interpolation weights must not round to
    # bf16 on the MXU — resize parity is load-bearing for accuracy.
    x = jnp.einsum("oh,...hwc->...owc", a_h, x, precision="highest")
    x = jnp.einsum("ow,...hwc->...hoc", a_w, x, precision="highest")
    return x


def upsample_bilinear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """×scale bilinear upsample (torch F.interpolate semantics), NHWC."""
    return resize_bilinear(x, (x.shape[-3] * scale, x.shape[-2] * scale))


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize matching cv2.INTER_NEAREST, NHWC/HWC."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    ys = np.minimum(np.floor(np.arange(h_out) * (h_in / h_out)).astype(np.int32), h_in - 1)
    xs = np.minimum(np.floor(np.arange(w_out) * (w_in / w_out)).astype(np.int32), w_in - 1)
    return x[..., ys, :, :][..., :, xs, :]
