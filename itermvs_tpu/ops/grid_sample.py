"""Bilinear grid sampling with torch `F.grid_sample` semantics, TPU-fast.

Matches `mode='bilinear', padding_mode='zeros', align_corners=True`
(the exact configuration the reference warping relies on,
models/module.py:118-119): normalized coords in [-1, 1] map to pixel
centers `p = (g + 1) / 2 * (size - 1)`, and each of the four bilinear
corners contributes 0 when it falls outside the image.

TPU formulation — corner-packed single gather. Instead of four separate
row gathers (one per bilinear corner), the source is expanded once into
a corner-packed tensor `[..., H, W, 4C]` holding the values at
(y, x), (y, x+1), (y+1, x), (y+1, x+1) — shifted copies, zero-filled at
the far edges — so every output sample is ONE flat single-axis
`jnp.take` row gather of 4C channels plus a 4-tap weighted sum. On TPU
this hits XLA's vectorized dynamic-gather path and measures ~25x faster
than the 4-gather / batched-take_along_axis formulation it replaces.

Zeros-padding semantics at the borders come from two facts:
  (a) packing zero-fills the +1 shifts at the image edge, so
      out-of-range x+1 / y+1 corners contribute exactly 0;
  (b) when floor(x) itself is out of range, the gather base is clamped
      into the image and the per-axis tap weights are re-derived
      against the clamped base (`_axis_taps`): the weight moves to the
      surviving in-bounds corner, or to zero when both corners are
      outside — identical to per-corner validity masking.
"""
from __future__ import annotations

import jax.numpy as jnp


def pack_corners(src: jnp.ndarray) -> jnp.ndarray:
    """Corner-pack `[..., H, W, C]` features into `[..., H, W, 4C]`.

    Slot k of the last axis holds the value at the bilinear corner
    (y + k//2, x + k%2); +1 shifts are zero-filled at the image edge.
    Done once per source map, reused by every gather against it (the
    GRU loop re-warps the same source features every iteration).
    """
    lead = [(0, 0)] * (src.ndim - 3)
    sx = jnp.pad(src[..., :, 1:, :], lead + [(0, 0), (0, 1), (0, 0)])
    sy = jnp.pad(src[..., 1:, :, :], lead + [(0, 1), (0, 0), (0, 0)])
    sxy = jnp.pad(src[..., 1:, 1:, :], lead + [(0, 1), (0, 1), (0, 0)])
    return jnp.concatenate([src, sx, sy, sxy], axis=-1)


def _axis_taps(p: jnp.ndarray, size: int):
    """Clamped gather base + 2-tap weights along one axis.

    For sample coordinate `p` (pixels), the true bilinear corners are
    floor(p) (weight 1-frac) and floor(p)+1 (weight frac). The base is
    clamped into [0, size-1]; weights are assigned to the packed slots
    (base, base+1) so that exactly the in-bounds corners contribute:
      floor(p) in range      -> (1-frac, frac)   [slot base+1 zero-
                                filled by packing when floor(p)=size-1]
      floor(p) == -1         -> (frac, 0)        [only corner 0 valid]
      both corners outside   -> (0, 0)
    """
    p0 = jnp.floor(p)
    base = jnp.clip(p0, 0.0, float(size - 1))
    frac = p - p0
    at_base = p0 == base
    w_a = jnp.where(at_base, 1.0 - frac, jnp.where(p0 + 1.0 == base, frac, 0.0))
    w_b = jnp.where(at_base, frac, 0.0)
    return base.astype(jnp.int32), w_a, w_b


def gather_bilinear(packed: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray
                    ) -> jnp.ndarray:
    """Sample corner-packed `[B, H, W, 4C]` at pixel coords `px, py` [B, ...].

    Returns `[B, ..., C]`. One flat row gather + 4-tap weighted sum.
    """
    b, h, w, c4 = packed.shape
    c = c4 // 4
    out_shape = px.shape[1:]
    px = px.reshape(b, -1)
    py = py.reshape(b, -1)

    bx, wx_a, wx_b = _axis_taps(px, w)
    by, wy_a, wy_b = _axis_taps(py, h)

    idx = by * w + bx                                        # [B, P]
    if b > 1:
        idx = idx + (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]
    # Indices are in-bounds by construction (_axis_taps clamps the
    # base). mode="clip" clamps the [P] index vector (cheap) instead of
    # the default fill mode's compare+select pass over the gathered
    # [P, 4C] block (~1.5 ms per init-branch view at DTU eval size).
    vals = jnp.take(packed.reshape(b * h * w, c4), idx.reshape(-1), axis=0,
                    mode="clip")
    v = vals.reshape(b, -1, 4, c)
    wgt = jnp.stack([wy_a * wx_a, wy_a * wx_b, wy_b * wx_a, wy_b * wx_b],
                    axis=-1)                                 # [B, P, 4]
    out = jnp.sum(v * wgt[..., None], axis=2)                # [B, P, C]
    return out.reshape(b, *out_shape, c)


def grid_sample(src: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample `src` [B, H, W, C] at `grid` [B, ..., 2] ((x, y) in [-1, 1]).

    Returns [B, ..., C]. Bilinear, zeros padding, align_corners=True.
    """
    b, h, w, c = src.shape
    px = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    py = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    return gather_bilinear(pack_corners(src), px, py)
