"""Bilinear grid sampling with torch `F.grid_sample` semantics, TPU-fast.

Matches `mode='bilinear', padding_mode='zeros', align_corners=True`
(the exact configuration the reference warping relies on,
models/module.py:118-119): normalized coords in [-1, 1] map to pixel
centers `p = (g + 1) / 2 * (size - 1)`, and each of the four bilinear
corners contributes 0 when it falls outside the image.

TPU formulation — corner-packed row gathers with an adaptive packing
factor. Instead of four separate batched take_along_axis gathers (one
per bilinear corner, a scalarized path on TPU), the source is expanded
once into a corner-packed tensor holding 4, 2, or 1 bilinear corners
per row — shifted copies, zero-filled at the far edges — and each
output sample costs 1, 2, or 4 flat single-axis `jnp.take` row gathers
plus the tap-weighted sum.

Full 4-corner packing is the default and measures fastest everywhere:
XLA:TPU row-gather cost is row-count-bound (~10 ns/row from HBM,
~3 ns/row for tables small enough to sit in VMEM, measured on v5e via
device trace), so one gather of 4C-channel rows beats two or four
gathers of narrower rows even though the packed table is 4x the
features. The 2-/1-corner modes exist for memory-constrained cases
(the packed table is 4x the source features) and are covered by the
same parity tests.

Zeros-padding semantics at the borders come from two facts:
  (a) packing zero-fills the +1 shifts at the image edge, so
      out-of-range packed corners contribute exactly 0;
  (b) when floor(x) itself is out of range, the gather base is clamped
      into the image and the per-axis tap weights are re-derived
      against the clamped base (`_axis_taps`): the weight moves to the
      surviving in-bounds corner, or to zero when both corners are
      outside — identical to per-corner validity masking. For corners
      fetched by an explicitly clamped second gather (the 2-/1-corner
      modes), the same zeroing is applied to the +1 tap weight at the
      image edge (`_axis_taps_pair`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

class PackedSource(NamedTuple):
    """Corner-packed source features.

    data: [B, H, W, corners*C]; corners in {4, 2, 1}:
      4 -> slots (y,x), (y,x+1), (y+1,x), (y+1,x+1)
      2 -> slots (y,x), (y,x+1)           (x-pair; y via 2 gathers)
      1 -> unpacked                        (4 gathers)
    """
    data: jnp.ndarray
    corners: int

    @property
    def src_shape(self):
        return self.data.shape


# XLA:TPU's vectorized dynamic row-gather runs ~2-3 ns/row while the
# table holds at most 2^15 8-row sublane tiles (262144 rows) and ~5x
# slower above — measured via device trace at 1600x1152: the level-1
# [460800, 64] table gathers at 10.8 ns/row while [248832, 64] /
# [230400, 192] / [115200, 128] all gather at ~1.9-3 ns/row, and
# splitting channels ([460800, 32]) does NOT help, so the cliff is on
# row count, not bytes.
FAST_GATHER_MAX_ROWS = 262144


class BandedSource(NamedTuple):
    """A 4-corner-packed table split along BATCH-SAMPLE boundaries, and
    within a sample into row bands that each fit the fast-gather row
    limit.

    Sample-boundary splitting is the key property for batch > 1: each
    sample's indices address only its own [H·W, 4C] table, so a batched
    warp costs exactly batch × (single-sample rows) — the round-1
    "batching hurts" cliff (one flat B·H·W-row table → every gather
    pays n_bands × rows in band-masked passes) disappears. Within-sample
    bands (needed when H·W itself exceeds the limit, e.g. level 1 at
    1600×1152) keep the round-2 masked-band scheme: n_bands × fast-rate
    beats 1 × cliff-rate for the ≤4 bands any supported size needs."""
    bands: tuple          # [rows_i, corners*C] tables, grouped by sample
    sample_ids: tuple     # owning batch sample of each band
    row_offsets: tuple    # starting row of each band WITHIN its sample
    shape: tuple          # original (B, H, W, corners*C)
    corners: int

    @property
    def src_shape(self):
        return self.shape


# Packed tables cross jit boundaries (the eval feature cache holds them
# per scan view and feeds them to the jitted match step). Explicit
# pytree registration keeps the structural fields — packing factor, band
# geometry — STATIC aux data instead of letting the namedtuple fallback
# trace them (Python `if corners == 4` / band loops need concrete ints).
jax.tree_util.register_pytree_node(
    PackedSource,
    lambda p: ((p.data,), p.corners),
    lambda corners, children: PackedSource(children[0], corners),
)
jax.tree_util.register_pytree_node(
    BandedSource,
    lambda p: (tuple(p.bands),
               (p.sample_ids, p.row_offsets, p.shape, p.corners)),
    lambda aux, bands: BandedSource(tuple(bands), *aux),
)


def pack_corners_fast(src: jnp.ndarray, corners: int = 4):
    """`pack_corners`, sample-split + row-banded when the flat table
    would exceed the fast-gather row limit (split once at pack time;
    reused by every warp)."""
    packed = pack_corners(src, corners)
    b, h, w, ck = packed.data.shape
    if corners != 4 or b * h * w <= FAST_GATHER_MAX_ROWS:
        return packed
    per_sample = h * w
    n = -(-per_sample // FAST_GATHER_MAX_ROWS)   # bands per sample
    per = -(-per_sample // n)
    bands, sample_ids, offsets = [], [], []
    for i in range(b):
        flat = packed.data[i].reshape(per_sample, ck)
        for j in range(n):
            off = j * per
            bands.append(flat[off:off + min(per, per_sample - off)])
            sample_ids.append(i)
            offsets.append(off)
    return BandedSource(tuple(bands), tuple(sample_ids), tuple(offsets),
                        (b, h, w, ck), 4)


def pack_corners(src: jnp.ndarray, corners: int = 4) -> PackedSource:
    """Corner-pack `[..., H, W, C]` features for fast bilinear gathers.

    Done once per source map, reused by every gather against it (the
    GRU loop re-warps the same source features every iteration).
    4 corners per row (the default) minimizes gather row count, which
    is what the XLA:TPU gather path is bound by; pass 2 or 1 to trade
    gather count for a 2x/4x smaller table.
    """
    lead = [(0, 0)] * (src.ndim - 3)
    if corners == 1:
        return PackedSource(src, 1)
    sx = jnp.pad(src[..., :, 1:, :], lead + [(0, 0), (0, 1), (0, 0)])
    if corners == 2:
        return PackedSource(jnp.concatenate([src, sx], axis=-1), 2)
    sy = jnp.pad(src[..., 1:, :, :], lead + [(0, 1), (0, 0), (0, 0)])
    sxy = jnp.pad(src[..., 1:, 1:, :], lead + [(0, 1), (0, 1), (0, 0)])
    return PackedSource(jnp.concatenate([src, sx, sy, sxy], axis=-1), 4)


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


def _axis_taps_pair(p: jnp.ndarray, size: int):
    """`_axis_taps` for corners fetched by an explicit second gather.

    Without zero-filled packing along this axis, the +1 corner at the
    image edge must lose its weight (the 4-corner mode gets this for
    free from the zero fill); the second gather index is clamped.
    """
    base, w_a, w_b = _axis_taps(p, size)
    w_b = w_b * (base < size - 1)
    base2 = jnp.minimum(base + 1, size - 1)
    return base, base2, w_a, w_b


def _flat_take(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather. Indices are in-bounds by construction; mode="clip"
    clamps the [P] index vector (cheap) instead of the default fill
    mode's compare+select pass over the gathered [P, kC] block."""
    return jnp.take(table, idx.reshape(-1), axis=0, mode="clip")


def _flat_take_banded(packed: "BandedSource", idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather over a sample-split, row-banded table.

    `idx` is [B, P] of WITHIN-SAMPLE row indices. Each sample's indices
    are gathered only from that sample's own bands (per-sample index
    slicing — no cross-sample masking passes); when a sample has
    multiple bands, each band is gathered with band-clipped indices and
    masked to the rows it owns, and the masked partials sum to the
    exact gather (each row lands in exactly one band)."""
    b = packed.shape[0]
    per_sample = [[] for _ in range(b)]
    for band, sid, off in zip(packed.bands, packed.sample_ids,
                              packed.row_offsets):
        per_sample[sid].append((band, off))
    outs = []
    for i in range(b):
        flat = idx[i].reshape(-1)
        acc = None
        multi = len(per_sample[i]) > 1
        for band, off in per_sample[i]:
            size = band.shape[0]
            g = jnp.take(band, jnp.clip(flat - off, 0, size - 1), axis=0,
                         mode="clip")
            if multi:
                mask = ((flat >= off) & (flat < off + size)).astype(band.dtype)
                g = g * mask[:, None]
            acc = g if acc is None else acc + g
        outs.append(acc)
    return outs[0] if b == 1 else jnp.concatenate(outs, axis=0)


def gather_corners(packed, flat_idx: jnp.ndarray, w00, w01, w10, w11
                   ) -> jnp.ndarray:
    """Row-gather a 4-corner packed table and apply the bilinear taps.

    Args:
      packed: `PackedSource` / `BandedSource` with corners == 4.
      flat_idx: [B, P] int32 base-corner row indices, within-sample.
      w00..w11: [B, P] tap weights, already in the table dtype.

    Returns [B, P, C]. One flat row gather + the corner sum as 4
    contiguous lane-slices (see gather_bilinear for why slices beat a
    corner-axis reduce).
    """
    b, h, w, ck = packed.src_shape
    c = ck // 4
    if isinstance(packed, BandedSource):
        vals = _flat_take_banded(packed, flat_idx)
    else:
        table = packed.data.reshape(b * h * w, ck)
        boff = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None] if b > 1 else 0
        vals = _flat_take(table, flat_idx + boff)
    v = vals.reshape(b, -1, 4 * c)
    return (v[..., 0 * c:1 * c] * w00[..., None]
            + v[..., 1 * c:2 * c] * w01[..., None]
            + v[..., 2 * c:3 * c] * w10[..., None]
            + v[..., 3 * c:4 * c] * w11[..., None])         # [B, P, C]


def gather_bilinear(packed: PackedSource, px: jnp.ndarray, py: jnp.ndarray
                    ) -> jnp.ndarray:
    """Sample a `PackedSource` at pixel coords `px, py` [B, ...].

    Returns `[B, ..., C]`. 1, 2, or 4 flat row gathers (by packing
    factor) + tap-weighted sum; identical math in all modes.
    """
    banded = isinstance(packed, BandedSource)
    corners = packed.corners
    b, h, w, ck = packed.src_shape
    c = ck // corners
    out_shape = px.shape[1:]
    px = px.reshape(b, -1)
    py = py.reshape(b, -1)
    if banded:
        data = packed.bands[0]            # dtype carrier only
        table = None
    else:
        data = packed.data
        table = data.reshape(b * h * w, ck)
    boff = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None] if b > 1 else 0

    # Tap weights are applied in the table's dtype: exact in float32
    # mode; in bfloat16 mode this keeps the whole gather -> weighted-sum
    # chain bf16 (no f32 copy of the gathered block gets materialized —
    # measured 4.6 -> 2.7 ms per init-branch view at DTU eval size).
    # Downstream correlation reductions accumulate in float32.
    def cast(*ws):
        return [wi.astype(data.dtype) for wi in ws]

    if corners == 4:
        bx, wx_a, wx_b = _axis_taps(px, w)
        by, wy_a, wy_b = _axis_taps(py, h)
        # Corner sum as 4 contiguous lane-slices + weighted adds (pure
        # elementwise) instead of reshape-[.., 4, C] + reduce over the
        # corner axis: the cross-minor reduce makes XLA relayout the
        # gathered block to column-major first (measured ~6.5 ms/step of
        # [P, 4C] transposes at 1152×864, ~21 ms at 1600×1152).
        (w00,) = cast(wy_a * wx_a)
        (w01,) = cast(wy_a * wx_b)
        (w10,) = cast(wy_b * wx_a)
        (w11,) = cast(wy_b * wx_b)
        out = gather_corners(packed, by * w + bx, w00, w01, w10, w11)
    elif corners == 2:
        bx, wx_a, wx_b = _axis_taps(px, w)
        by, by2, wy_a, wy_b = _axis_taps_pair(py, h)
        wx_a, wx_b, wy_a, wy_b = cast(wx_a, wx_b, wy_a, wy_b)
        top = _flat_take(table, by * w + bx + boff).reshape(b, -1, 2, c)
        bot = _flat_take(table, by2 * w + bx + boff).reshape(b, -1, 2, c)
        row = top * wy_a[..., None, None] + bot * wy_b[..., None, None]
        out = (row[:, :, 0] * wx_a[..., None] + row[:, :, 1] * wx_b[..., None])
    else:
        bx, bx2, wx_a, wx_b = _axis_taps_pair(px, w)
        by, by2, wy_a, wy_b = _axis_taps_pair(py, h)
        wx_a, wx_b, wy_a, wy_b = cast(wx_a, wx_b, wy_a, wy_b)
        v00 = _flat_take(table, by * w + bx + boff).reshape(b, -1, c)
        v01 = _flat_take(table, by * w + bx2 + boff).reshape(b, -1, c)
        v10 = _flat_take(table, by2 * w + bx + boff).reshape(b, -1, c)
        v11 = _flat_take(table, by2 * w + bx2 + boff).reshape(b, -1, c)
        out = (v00 * (wy_a * wx_a)[..., None] + v01 * (wy_a * wx_b)[..., None]
               + v10 * (wy_b * wx_a)[..., None] + v11 * (wy_b * wx_b)[..., None])
    return out.reshape(b, *out_shape, c)


def grid_sample(src: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample `src` [B, H, W, C] at `grid` [B, ..., 2] ((x, y) in [-1, 1]).

    Returns [B, ..., C]. Bilinear, zeros padding, align_corners=True.
    """
    b, h, w, c = src.shape
    px = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    py = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    return gather_bilinear(pack_corners(src), px, py)
