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
  where possible;
* the bilinear gather uses the corner-packed single-gather formulation
  (ops/grid_sample.py): `pack_bilinear` expands source features once to
  4C corner slots, and each warp is one flat row gather — the packed
  tensor is built once per (view, level) and reused by every GRU
  iteration's re-warp (`warp_corr_packed`).

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

from itermvs_tpu.ops.grid_sample import gather_bilinear, pack_corners_fast


def _projection_pixels(proj: jnp.ndarray, depth_samples: jnp.ndarray,
                       src_hw: tuple[int, int]):
    """Projective sampling positions in source-pixel units.

    Args:
      proj: [B, 4, 4] relative projection `src_proj @ inv(ref_proj)`.
      depth_samples: [B, N, H, W] depths at the reference view.
      src_hw: (H1, W1) of the source feature map being sampled.

    Returns: (px, py), each [B, N, H, W] float pixel coords into the
    source map, stop-gradiented.
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

    grid_px = (px / pz).reshape(b, n, h, w)
    grid_py = (py / pz).reshape(b, n, h, w)
    return jax.lax.stop_gradient(grid_px), jax.lax.stop_gradient(grid_py)


def pack_bilinear(src_fea: jnp.ndarray):
    """Corner-pack source features `[B, H1, W1, C]` → packed table.

    Build once per (view, level); every warp against the same source —
    the init sweep and all GRU iterations — reuses it. Tables whose row
    count exceeds the measured fast-gather limit (2^15 8-row sublane
    tiles — e.g. level-1 at ≥1600×1152) are split into row bands at
    pack time: each band gathers at the ~2-3 ns/row fast rate, which
    beats one cliff-rate gather (10.8 ns/row measured) for ≤4 bands.
    See ops/grid_sample.py FAST_GATHER_MAX_ROWS.
    """
    return pack_corners_fast(src_fea)


def differentiable_warp_packed(packed_src, proj: jnp.ndarray,
                               depth_samples: jnp.ndarray) -> jnp.ndarray:
    """Warp corner-packed (`PackedSource`) source features.

    Args:
      proj: [B, 4, 4] relative projection `src_proj @ inv(ref_proj)`.
      depth_samples: [B, N, H, W].

    Returns warped features [B, N, H, W, C].
    """
    px, py = _projection_pixels(proj, depth_samples, packed_src.src_shape[1:3])
    return gather_bilinear(packed_src, px, py)


def differentiable_warp(src_fea: jnp.ndarray, proj: jnp.ndarray,
                        depth_samples: jnp.ndarray) -> jnp.ndarray:
    """Warp `src_fea` [B, H1, W1, C] to reference-view depth samples.

    Args:
      proj: [B, 4, 4] relative projection `src_proj @ inv(ref_proj)`.
      depth_samples: [B, N, H, W].

    Returns warped features [B, N, H, W, C].
    """
    return differentiable_warp_packed(pack_bilinear(src_fea), proj,
                                      depth_samples)


def group_corr(warped: jnp.ndarray, ref_fea: jnp.ndarray, groups: int
                ) -> jnp.ndarray:
    """Group-wise correlation of warped [B,N,H,W,C] vs ref [B,H,W,C].

    Multiply in the feature dtype, accumulate the group mean in f32
    (the reduce fusion reads bf16 and emits f32 in bf16 mode)."""
    import os

    b, n, h, w, c = warped.shape
    cg = c // groups
    if os.environ.get("ITERMVS_CORR_DOT"):
        # Experimental (measured SLOWER, see docs/PERFORMANCE.md): the
        # group mean as an MXU contraction against a block-diagonal
        # [C, G] matrix, freeing XLA from the cross-minor reduce (and
        # its relayout of the gathered block). Caveats: in bf16 mode
        # the 1/cg entries round to bf16 (1/6 is inexact → ~1e-3 rel
        # difference vs the default f32-accumulated mean), and the env
        # var is read at TRACE time — toggling it after a compile-cache
        # hit has no effect. Evaluated via tools/profile_trace.py.
        import numpy as np

        mean_mat = jnp.asarray(
            np.repeat(np.eye(groups), cg, axis=0) / cg, warped.dtype)
        prod = warped * ref_fea[:, None].astype(warped.dtype)
        return jnp.einsum("bnhwc,cg->bnhwg", prod, mean_mat,
                          preferred_element_type=jnp.float32)
    prod = warped.reshape(b, n, h, w, groups, cg) * ref_fea.reshape(
        b, 1, h, w, groups, cg
    ).astype(warped.dtype)
    return jnp.mean(prod, axis=-1, dtype=jnp.float32)


def fused_sweep_taps(rel_projs: jnp.ndarray, depth_samples: jnp.ndarray,
                     level_of_sample, src_hws, table_dtype):
    """Gather indices + bilinear tap weights for a multi-level,
    multi-view sweep, computed as ONE elementwise chain.

    The GRU iteration warps every source view at 3 pyramid levels
    (reference models/itermvs.py:84-126) — 12 warps per iteration whose
    projective/tap math ran as 12 separate small-op chains (the
    dominant share of the ~1900-event layout/copy tail at 1152×864,
    docs/PERFORMANCE.md). Per-level source resolutions only enter this
    math as per-sample constants (grid scale, clamp bounds, row pitch),
    so the whole chain batches over [B, V, N, H, W] with broadcast
    per-sample constants — element-for-element the same operations as
    the per-(view, level) path (tests/test_warping.py pins equality).

    Args:
      rel_projs: [B, V, L, 4, 4] relative projections per (view, level).
      depth_samples: [B, N, H, W] depths, per-level stacks concatenated
        along the sample axis.
      level_of_sample: static length-N tuple mapping sample → level idx.
      src_hws: per-level (H_l, W_l) source-feature sizes.
      table_dtype: dtype of the packed gather tables (tap weights are
        pre-cast so the gather epilogue stays in the table dtype).

    Returns (flat_idx [B,V,N,H,W] int32 base-corner row indices,
    (w00, w01, w10, w11) tap weights in table_dtype).
    """
    b, n, h, w = depth_samples.shape
    v = rel_projs.shape[1]

    rot = rel_projs[..., :3, :3]                     # [B,V,L,3,3]
    trans = rel_projs[..., :3, 3]                    # [B,V,L,3]

    # Per-level reference grids in source-pixel units [L, H*W, 3] —
    # identical per-element math to the per-level grids (the level only
    # scales the arange, module.py:95-96 semantics).
    grids = []
    for h1, w1 in src_hws:
        xs = jnp.arange(w, dtype=jnp.float32) * (w1 / w)
        ys = jnp.arange(h, dtype=jnp.float32) * (h1 / h)
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        grids.append(jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1
                               ).reshape(h * w, 3))
    xyz = jnp.stack(grids, axis=0)                   # [L, HW, 3]

    # HIGHEST precision: projective coordinates must not round to bf16
    # on the MXU — sub-pixel grid errors cost mm-level depth accuracy.
    rot_xyz = jnp.einsum("bvlij,lpj->bvlpi", rot, xyz,
                         precision="highest")        # [B,V,L,HW,3]

    # Expand level → sample axis (static broadcast-concat; XLA folds it
    # into the consuming fusion).
    def per_sample(x):                               # [B,V,L,...] -> [B,V,N,...]
        parts = []
        for s in range(n):
            parts.append(x[:, :, level_of_sample[s]:level_of_sample[s] + 1])
        return jnp.concatenate(parts, axis=2)

    rot_s = per_sample(rot_xyz)                      # [B,V,N,HW,3]
    trans_s = per_sample(trans[..., None, :])        # [B,V,N,1,3]
    proj_xyz = rot_s * depth_samples.reshape(b, 1, n, h * w, 1) + trans_s

    z = proj_xyz[..., 2]
    valid = z > 1e-2
    # Behind-camera samples land on (W_d, H_d) with z=1 — reference
    # behavior (module.py:104-108); depth-grid dims, level-independent.
    px = jnp.where(valid, proj_xyz[..., 0], jnp.float32(w))
    py = jnp.where(valid, proj_xyz[..., 1], jnp.float32(h))
    pz = jnp.where(valid, z, 1.0)
    px = jax.lax.stop_gradient(px / pz)              # [B,V,N,HW]
    py = jax.lax.stop_gradient(py / pz)

    # Per-sample clamp bounds / row pitch as broadcast constants.
    size_x = jnp.asarray([src_hws[l][1] for l in level_of_sample],
                         jnp.float32).reshape(1, 1, n, 1)
    size_y = jnp.asarray([src_hws[l][0] for l in level_of_sample],
                         jnp.float32).reshape(1, 1, n, 1)
    pitch = jnp.asarray([src_hws[l][1] for l in level_of_sample],
                        jnp.int32).reshape(1, 1, n, 1)

    def axis_taps(p, size):
        # _axis_taps with a per-sample size array (same per-element math).
        p0 = jnp.floor(p)
        base = jnp.clip(p0, 0.0, size - 1.0)
        frac = p - p0
        at_base = p0 == base
        w_a = jnp.where(at_base, 1.0 - frac,
                        jnp.where(p0 + 1.0 == base, frac, 0.0))
        w_b = jnp.where(at_base, frac, 0.0)
        return base.astype(jnp.int32), w_a, w_b

    bx, wx_a, wx_b = axis_taps(px, size_x)
    by, wy_a, wy_b = axis_taps(py, size_y)
    flat_idx = (by * pitch + bx).reshape(b, v, n, h, w)
    taps = tuple((wy * wx).astype(table_dtype).reshape(b, v, n, h, w)
                 for wy, wx in ((wy_a, wx_a), (wy_a, wx_b),
                                (wy_b, wx_a), (wy_b, wx_b)))
    return flat_idx, taps


def interleave_perm(channels: int, groups: int):
    """Permutation putting correlation-group channels at stride G.

    Natural (reference) feature order is group-major: channel c belongs
    to group c // (C/G). Applying this permutation to BOTH the source
    and reference features reorders them group-minor — new channel
    k = j*G + g holds old channel g*(C/G) + j — so the per-group sum in
    `warp_corr_packed` becomes C/G *contiguous* G-wide lane slices of
    the product instead of a cross-minor reduce (which makes XLA
    relayout every gathered block to column-major first; measured
    ~6.5 ms/step of [P, 4C] transposes at 1152×864). Group identity and
    the summed channel sets are unchanged, so the correlation output is
    numerically the same (up to f32 reassociation of the C/G-term sum).
    """
    import numpy as np
    cg = channels // groups
    idx = np.empty(channels, np.int32)
    for g in range(groups):
        for j in range(cg):
            idx[j * groups + g] = g * cg + j
    return jnp.asarray(idx)


def warp_corr_packed(packed_src, ref_fea: jnp.ndarray,
                     proj: jnp.ndarray, depth_samples: jnp.ndarray,
                     groups: int, interleaved: bool = False) -> jnp.ndarray:
    """Fused warp + group-wise correlation on corner-packed features.

    Args:
      packed_src: `PackedSource` from `pack_bilinear`.
      ref_fea: [B, H, W, C] reference features at depth-grid resolution.
      proj: [B, 4, 4] relative projection.
      depth_samples: [B, N, H, W].
      groups: number of correlation groups G (C must divide).
      interleaved: features were permuted by `interleave_perm` — group
        channels sit at stride G, so the group sum runs as contiguous
        lane slices (no relayout of the gathered block).

    Returns correlation [B, N, H, W, G]: per group, the mean over the
    C/G in-group channels of (warped ⊙ ref).
    """
    b, n, h, w = depth_samples.shape
    c = packed_src.src_shape[-1] // packed_src.corners
    cg = c // groups
    warped = differentiable_warp_packed(packed_src, proj, depth_samples)
    if interleaved:
        # Group sum as cg contiguous G-wide lane slices of the product,
        # accumulated in f32 — pure elementwise ops that fuse with the
        # gather epilogue, like the 4-corner sum in gather_bilinear.
        prod = warped * ref_fea[:, None].astype(warped.dtype)
        acc = prod[..., :groups].astype(jnp.float32)
        for j in range(1, cg):
            acc = acc + prod[..., j * groups:(j + 1) * groups].astype(jnp.float32)
        return acc / cg
    # Note: expressing the group sum as cg strided lane-slices + adds
    # (like the corner sum in gather_bilinear) was measured SLOWER
    # (83 → 90 ms at 1152×864) — strided lane shuffles cost more than
    # the reduce's relayout; contiguous corner slices are the
    # exception, not the rule.
    return group_corr(warped, ref_fea, groups)


def warp_corr(src_fea: jnp.ndarray, ref_fea: jnp.ndarray, proj: jnp.ndarray,
              depth_samples: jnp.ndarray, groups: int) -> jnp.ndarray:
    """`warp_corr_packed` on unpacked source features (packs internally)."""
    return warp_corr_packed(pack_bilinear(src_fea), ref_fea, proj,
                            depth_samples, groups)


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
