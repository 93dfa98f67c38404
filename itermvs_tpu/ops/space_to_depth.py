"""Space-to-depth stem transform: full-resolution convs at half res.

The FeatureNet stem (reference net.py:13-14: `conv1` 3×3 s1 3→8 at full
resolution, then layer1's stride-2 entry convs) is the only full-res
compute in the model, and on TPU its tiny channel counts (3/8) waste
almost the whole 128-lane vector unit / MXU tile. Re-expressing the stem
over a space-to-depth input — x [N,H,W,3] → X [N,H/2,W/2,12], phases
packed channel-minor as (ry, rx, c) — does the same math with 4× fewer
output positions:

  * a 3×3 stride-1 conv producing f[2i+py, 2j+px, o] for all four
    output phases becomes ONE 3×3 conv over the s2d grid with
    12 → 4·C_out channels (tap (ky,kx) of phase (py,px) reads s2d tap
    qy = floor((py+ky−1)/2), phase-row ry = (py+ky−1) − 2·qy);
  * a 3×3 stride-2 conv consuming f becomes a 2×2 conv over the s2d
    grid with 4·C_in → C_out channels and top/left-only padding
    (its taps touch rows 2i−1, 2i, 2i+1 = s2d rows i−1, i with both
    phases);
  * BatchNorm on the phase-packed activation reuses the original
    per-channel parameters tiled 4× (eval mode / running stats only —
    batch statistics over the s2d grid would average over phases, so
    training keeps the standard stem).

All rearrangements are pure weight reshuffles of the stored HWIO
kernels (zero-filled where a (tap, phase) pair is unused), built inside
the traced function — they are O(kernel) and negligible next to the
convs they feed.
"""
from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] → [N, H/2, W/2, 4C], phase-major channel packing
    (ry, rx, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _phase_maps():
    """(phase p, kernel tap k) → (s2d tap q+1, phase row r) for u = p+k−1."""
    out = {}
    for p in (0, 1):
        for k in (0, 1, 2):
            u = p + k - 1
            q = u // 2 if u >= 0 else -1
            r = u - 2 * q
            out[(p, k)] = (q + 1, r)   # q+1: conv tap index with pad 1
    return out


_PHASE = _phase_maps()


def stride1_kernel_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """HWIO [3,3,Ci,Co] stride-1 kernel → s2d [3,3,4Ci,4Co].

    Output channel layout: (py, px, o) phase-major; input (ry, rx, c).
    Use with padding ((1,1),(1,1)) on the s2d grid."""
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3)
    pieces = []
    for py in (0, 1):
        for px in (0, 1):
            for ky in range(3):
                for kx in range(3):
                    ty, ry = _PHASE[(py, ky)]
                    tx, rx = _PHASE[(px, kx)]
                    pieces.append(((ty, tx, ry, rx, py, px), (ky, kx)))
    # Build as a scatter of w slices into a zero tensor (traced, tiny).
    outj = jnp.zeros((3, 3, 4 * ci, 4 * co), dtype=w.dtype)
    for (ty, tx, ry, rx, py, px), (ky, kx) in pieces:
        ci_s = (ry * 2 + rx) * ci
        co_s = (py * 2 + px) * co
        outj = outj.at[ty, tx, ci_s:ci_s + ci, co_s:co_s + co].add(w[ky, kx])
    return outj


def stride2_kernel_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """HWIO [3,3,Ci,Co] stride-2 kernel → s2d [2,2,4Ci,Co].

    Consumes phase-major-packed input; use with padding ((1,0),(1,0))
    and stride 1 on the s2d grid (output is already at half res)."""
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3)
    outj = jnp.zeros((2, 2, 4 * ci, co), dtype=w.dtype)
    for ky in range(3):
        for kx in range(3):
            ty, ry = _PHASE[(0, ky)]   # stride-2 output = phase 0 only
            tx, rx = _PHASE[(0, kx)]
            ci_s = (ry * 2 + rx) * ci
            outj = outj.at[ty, tx, ci_s:ci_s + ci, :].add(w[ky, kx])
    return outj


def tile_phases(vec: jnp.ndarray) -> jnp.ndarray:
    """Per-channel BN vector [C] → phase-packed [4C]."""
    return jnp.tile(vec, 4)
