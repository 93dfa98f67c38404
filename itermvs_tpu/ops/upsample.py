"""RAFT-style convex-combination upsampling (reference: models/module.py:127-140).

Each ×4 output sub-pixel is a softmax-weighted combination of the 3×3
replication-padded neighborhood of its parent coarse pixel. NHWC layout:
`x` is [B, H, W, 1] and `weights` the already-softmaxed taps
[B, H, W, 9, scale, scale].
"""
from __future__ import annotations

import jax.numpy as jnp


def convex_upsample(x: jnp.ndarray, weights: jnp.ndarray, scale: int = 4) -> jnp.ndarray:
    """Upsample [B, H, W, 1] to [B, scale·H, scale·W, 1].

    `weights`: [B, H, W, 9, scale, scale], convex over the 9 taps, tap
    order row-major over (dy, dx) ∈ {−1,0,1}².
    """
    b, h, w, c = x.shape
    assert c == 1, "convex_upsample expects a single-channel map"
    padded = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)), mode="edge")  # [B,H+2,W+2]
    # 9 shifted views of the padded map, tap-major [B, H, W, 9].
    taps = jnp.stack(
        [padded[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)],
        axis=-1,
    )
    up = jnp.einsum("bhwk,bhwkij->bhwij", taps, weights)   # [B, H, W, s, s]
    up = up.transpose(0, 1, 3, 2, 4).reshape(b, h * scale, w * scale, 1)
    return up
