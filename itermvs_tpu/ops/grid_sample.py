"""Bilinear grid sampling with torch `F.grid_sample` semantics.

Matches `mode='bilinear', padding_mode='zeros', align_corners=True`
(the exact configuration the reference warping relies on,
models/module.py:118-119): normalized coords in [-1, 1] map to pixel
centers `p = (g + 1) / 2 * (size − 1)`, and each of the four bilinear
corners contributes 0 when it falls outside the image.

Layout is NHWC. The gather is expressed over the flattened H·W axis via
`take_along_axis`, which XLA lowers to a batched dynamic-gather on TPU;
the fused Pallas kernel in ops/warp_corr_pallas.py replaces this on the
hot path.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample(src: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample `src` [B, H, W, C] at `grid` [B, ..., 2] ((x, y), in [-1, 1]).

    Returns [B, ..., C]. Bilinear, zeros padding, align_corners=True.
    """
    b, h, w, c = src.shape
    out_batch_shape = grid.shape[:-1]
    grid = grid.reshape(b, -1, 2)
    n = grid.shape[1]

    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    src_flat = src.reshape(b, h * w, c)

    def corner(xi, yi, weight):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = (yc * w + xc)[..., None]                      # [B, N, 1]
        vals = jnp.take_along_axis(src_flat, idx, axis=1)   # [B, N, C]
        return vals * (weight * valid.astype(src.dtype))[..., None]

    out = (
        corner(x0, y0, wx0 * wy0)
        + corner(x1, y0, wx1 * wy0)
        + corner(x0, y1, wx0 * wy1)
        + corner(x1, y1, wx1 * wy1)
    )
    return out.reshape(*out_batch_shape, c)
