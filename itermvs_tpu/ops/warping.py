"""Differentiable plane-sweep warping + group-wise correlation.

TPU-native reformulation of the reference's hot path
(models/module.py:68-125 `differentiable_warping` +
models/itermvs.py:49-51 group correlation):

* layouts are NHWC / depth-major `[B, N, H, W]`;
* the projective pixel grid is computed once per (view, depth set) in
  plain XLA ops (matmuls + elementwise) under `stop_gradient`, matching
  the reference's `torch.no_grad()` grid (module.py:77) — gradients flow
  only through the sampled features;
* `warp_corr` never hands a [B, C, N, H, W] tensor back to Python: the
  bilinear gather and the G-group correlation reduction are fused into
  one traced expression so XLA can keep the warped features out of HBM
  where possible. A Pallas kernel with identical semantics can be
  swapped in via `itermvs_tpu.ops.warp_corr_pallas`.

Exact-parity notes (verified against torch in tests/test_warping.py):
* behind-camera samples (z ≤ 1e-2) are remapped to pixel (W_d, H_d) of
  the *depth-grid* resolution with z = 1 before normalization — the
  reference does the same in-place masked assignment (module.py:104-108);
* normalized coords use the *source-feature* resolution
  (module.py:112-113), so sampling works across pyramid levels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from itermvs_tpu.ops.grid_sample import grid_sample


def _projection_grid(proj: jnp.ndarray, depth_samples: jnp.ndarray,
                     src_hw: tuple[int, int]) -> jnp.ndarray:
    """Normalized sampling grid for a projective warp.

    Args:
      proj: [B, 4, 4] relative projection `src_proj @ inv(ref_proj)`.
      depth_samples: [B, N, H, W] depths at the reference view.
      src_hw: (H1, W1) of the source feature map being sampled.

    Returns: [B, N, H, W, 2] grid (x, y) in [-1, 1], stop-gradiented.
    """
    b, n, h, w = depth_samples.shape
    h1, w1 = src_hw

    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3]

    # Reference pixel grid, rescaled into source-resolution pixel units.
    xs = jnp.arange(w, dtype=jnp.float32) * (w1 / w)
    ys = jnp.arange(h, dtype=jnp.float32) * (h1 / h)
    grid_x, grid_y = jnp.meshgrid(xs, ys, indexing="xy")          # [H, W]
    ones = jnp.ones_like(grid_x)
    xyz = jnp.stack([grid_x, grid_y, ones], axis=-1).reshape(1, h * w, 3)

    # HIGHEST precision: projective coordinates must not round to bf16
    # on the MXU — sub-pixel grid errors cost mm-level depth accuracy.
    rot_xyz = jnp.einsum("bij,bpj->bpi", rot, xyz, precision="highest")  # [B, H*W, 3]
    # [B, N, H*W, 3] = ray direction × depth + translation
    proj_xyz = (
        rot_xyz[:, None, :, :] * depth_samples.reshape(b, n, h * w, 1)
        + trans[:, None, None, :]
    )

    z = proj_xyz[..., 2]
    valid = z > 1e-2
    # Behind-camera samples land on (W_d, H_d) with z=1 — reference
    # behavior (module.py:104-108); note these are *depth-grid* dims.
    px = jnp.where(valid, proj_xyz[..., 0], jnp.float32(w))
    py = jnp.where(valid, proj_xyz[..., 1], jnp.float32(h))
    pz = jnp.where(valid, z, 1.0)

    x_norm = (px / pz) / ((w1 - 1) / 2.0) - 1.0
    y_norm = (py / pz) / ((h1 - 1) / 2.0) - 1.0
    grid = jnp.stack([x_norm, y_norm], axis=-1).reshape(b, n, h, w, 2)
    return jax.lax.stop_gradient(grid)


def differentiable_warp(src_fea: jnp.ndarray, proj: jnp.ndarray,
                        depth_samples: jnp.ndarray) -> jnp.ndarray:
    """Warp `src_fea` [B, H1, W1, C] to reference-view depth samples.

    Args:
      proj: [B, 4, 4] relative projection `src_proj @ inv(ref_proj)`.
      depth_samples: [B, N, H, W].

    Returns warped features [B, N, H, W, C].
    """
    grid = _projection_grid(proj, depth_samples, src_fea.shape[1:3])
    return grid_sample(src_fea, grid)


def warp_corr(src_fea: jnp.ndarray, ref_fea: jnp.ndarray, proj: jnp.ndarray,
              depth_samples: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Fused warp + group-wise correlation.

    Args:
      src_fea: [B, H1, W1, C] source-view features (native level res).
      ref_fea: [B, H, W, C] reference features at depth-grid resolution.
      proj: [B, 4, 4] relative projection.
      depth_samples: [B, N, H, W].
      groups: number of correlation groups G (C must divide).

    Returns correlation [B, N, H, W, G]: per group, the mean over the
    C/G in-group channels of (warped ⊙ ref).
    """
    b, n, h, w = depth_samples.shape
    c = src_fea.shape[-1]
    cg = c // groups
    warped = differentiable_warp(src_fea, proj, depth_samples)    # [B,N,H,W,C]
    prod = warped.reshape(b, n, h, w, groups, cg) * ref_fea.reshape(
        b, 1, h, w, groups, cg
    )
    return jnp.mean(prod, axis=-1)


def invert_projection(proj: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of [..., 4, 4] projections with last row [0,0,0,1].

    MVSNet-convention matrices embed `K·E[:3,:4]` above the extrinsic's
    [0,0,0,1] row, so `P = [[M, t], [0, 1]]` and
    `P⁻¹ = [[M⁻¹, −M⁻¹t], [0, 1]]` with M⁻¹ via the 3×3 adjugate — far
    better conditioned in fp32 than a generic 4×4 LU (the reference
    leans on torch.inverse, module.py:81-86; we avoid its noise).
    """
    m = proj[..., :3, :3]
    t = proj[..., :3, 3]

    # Adjugate / determinant 3×3 inverse.
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = c * h - b * i
    co_c = b * f - c * e
    co_d = f * g - d * i
    co_e = a * i - c * g
    co_f = c * d - a * f
    co_g = d * h - e * g
    co_h = b * g - a * h
    co_i = a * e - b * d
    det = a * co_a + b * co_d + c * co_g
    adj = jnp.stack([
        jnp.stack([co_a, co_b, co_c], axis=-1),
        jnp.stack([co_d, co_e, co_f], axis=-1),
        jnp.stack([co_g, co_h, co_i], axis=-1),
    ], axis=-2)
    m_inv = adj / det[..., None, None]

    t_inv = -jnp.einsum("...ij,...j->...i", m_inv, t, precision="highest")
    top = jnp.concatenate([m_inv, t_inv[..., None]], axis=-1)       # [..., 3, 4]
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def relative_projection(src_proj: jnp.ndarray, ref_proj: jnp.ndarray) -> jnp.ndarray:
    """`src_proj @ inv(ref_proj)` for [..., 4, 4] stacks."""
    return jnp.einsum("...ij,...jk->...ik", src_proj, invert_projection(ref_proj),
                      precision="highest")
