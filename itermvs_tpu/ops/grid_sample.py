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


class SuperpixelSource(NamedTuple):
    """2×2-superpixel 9-slot packed source.

    data: [B, ceil(H/2), ceil(W/2), 9·C]; slot (dy, dx), dy, dx ∈
      {0, 1, 2}, of superpixel (i, j) holds src[2i+dy, 2j+dx],
      zero-filled outside the image.
    shape: the VIRTUAL corner-packed shape (B, H, W, 4·C) — consumers
      read source geometry / C from `src_shape` exactly as for
      `PackedSource`.

    Any bilinear footprint (base corner (y, x), spanning y..y+1,
    x..x+1) lies inside the 3×3 pixel neighborhood of superpixel
    (y//2, x//2), so ONE row gather of a 4×-fewer-row table covers it.
    Used when the corner-packed table would exceed the fast-gather row
    limit within a sample: one fast-rate gather of H/2·W/2 rows beats
    the 2-band masked scheme's 2× redundant rows (measured 9.47 →
    7.47 ms per level-1 warp at 1600×1152, tools/exp_superpixel_gather
    .py; below the limit it LOSES — 2.25× row bytes for no row saving —
    so `pack_corners_fast` never picks it there)."""
    data: jnp.ndarray
    shape: tuple

    @property
    def src_shape(self):
        return self.shape

    @property
    def corners(self):
        return 4


class PairSource(NamedTuple):
    """1×2-pair 6-slot packed source.

    data: [B, H, ceil(W/2), 6·C]; slot (dy, dx), dy ∈ {0, 1},
      dx ∈ {0, 1, 2}, of pair (y, j) holds src[y+dy, 2j+dx],
      zero-filled outside the image.
    shape: the VIRTUAL corner-packed shape (B, H, W, 4·C), as for
      `SuperpixelSource`.

    Any bilinear footprint (base (y, x), spanning y..y+1, x..x+1) lies
    inside the 2×3 pixel window of pair (y, x//2), so ONE row gather of
    a 2×-fewer-row table covers it. Preferred over the 9-slot
    superpixel when the pair table fits the fast-gather row limit
    (arithmetically only possible at batch 1 — B·H·ceil(W/2) exceeds
    the oversize threshold H·W for B >= 2 — i.e. the eval case):
    6·C lanes stay within one 128-lane tile at C ≤ 21 where 9·C spills
    into a second tile, and gather cost tracks lane TILES touched per
    row — measured 2.96 vs 5.85 ns/row at the 1600×1152 level-1 shape
    ([230400, 96] pair vs [115200, 144] superpixel, C=16;
    tools/exp_lane_width.py). Below the row limit flat 4-corner packing
    still wins (4·C = 64 lanes, fewer table bytes), so
    `pack_corners_fast` never picks pair there."""
    data: jnp.ndarray
    shape: tuple

    @property
    def src_shape(self):
        return self.shape

    @property
    def corners(self):
        return 4


# Superpixel/pair packing kill-switches for in-context A/B measurement
# (ITERMVS_SUPERPIXEL=0 restores row banding above the gather limit;
# ITERMVS_PAIR=0 restores 2×2 superpixel packing where 1×2 pair would
# engage).
import os as _os

SUPERPIXEL_PACKING = _os.environ.get("ITERMVS_SUPERPIXEL", "1") != "0"
PAIR_PACKING = _os.environ.get("ITERMVS_PAIR", "1") != "0"


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
jax.tree_util.register_pytree_node(
    SuperpixelSource,
    lambda p: ((p.data,), p.shape),
    lambda shape, children: SuperpixelSource(children[0], shape),
)
jax.tree_util.register_pytree_node(
    PairSource,
    lambda p: ((p.data,), p.shape),
    lambda shape, children: PairSource(children[0], shape),
)


def pack_corners_fast(src: jnp.ndarray, corners: int = 4):
    """`pack_corners`, with the packing adapted to the fast-gather row
    limit (decided once at pack time; reused by every warp):

    * table fits flat -> `PackedSource` (one fast gather);
    * a single sample's H·W exceeds the limit but its 1×2-pair table
      fits -> `PairSource` (one fast gather of 2×-fewer, narrower rows
      — see the lane-tile measurement in the class docstring);
    * pair doesn't fit but the 2×2 superpixel table does ->
      `SuperpixelSource` (one fast gather of 4×-fewer rows — beats the
      2-band masked scheme's 2× redundant gathered rows);
    * otherwise -> `BandedSource` (sample-split, then row-banded)."""
    if (SUPERPIXEL_PACKING and corners == 4 and src.ndim == 4):
        b, h, w, _ = src.shape
        h2, w2 = -(-h // 2), -(-w // 2)
        if h * w > FAST_GATHER_MAX_ROWS:
            if PAIR_PACKING and b * h * w2 <= FAST_GATHER_MAX_ROWS:
                return pack_pair(src)
            if b * h2 * w2 <= FAST_GATHER_MAX_ROWS:
                return pack_superpixel(src)
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


def pack_superpixel(src: jnp.ndarray) -> SuperpixelSource:
    """2×2-superpixel-pack `[B, H, W, C]` features (9 slots per row).

    Slot (dy, dx) of superpixel (i, j) holds src[2i+dy, 2j+dx] with the
    same zero fill outside the image as `pack_corners`' shifted copies,
    so out-of-range bilinear corners contribute exactly 0.

    Construction uses only regular data movement: one reshape+transpose
    folds the padded image into 2×2 pixel blocks, and the dy/dx == 2
    halo slots are whole-array one-superpixel shifts of those blocks
    (stride-2 slot slices instead compile to gather fusions on TPU —
    measured 53 ms/step of packing at 1600×1152)."""
    b, h, w, c = src.shape
    h2, w2 = -(-h // 2), -(-w // 2)
    pad = jnp.pad(src, ((0, 0), (0, 2 * h2 - h), (0, 2 * w2 - w), (0, 0)))
    # [B, H2, W2, 4C]: lane blocks (0,0) (0,1) (1,0) (1,1).
    blk = pad.reshape(b, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5
                                                    ).reshape(b, h2, w2, 4 * c)
    # One-superpixel shifts with zero fill (pixel 2·w2 / 2·h2 is outside
    # the image, so the vacated edge is exactly 0).
    right = jnp.pad(blk[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    below = jnp.pad(blk[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    corner = jnp.pad(below[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    s = lambda a, dy, dx: a[..., (2 * dy + dx) * c:(2 * dy + dx + 1) * c]
    slots = [
        s(blk, 0, 0), s(blk, 0, 1), s(right, 0, 0),      # dy = 0
        s(blk, 1, 0), s(blk, 1, 1), s(right, 1, 0),      # dy = 1
        s(below, 0, 0), s(below, 0, 1), s(corner, 0, 0),  # dy = 2
    ]
    return SuperpixelSource(jnp.concatenate(slots, axis=-1),
                            (b, h, w, 4 * c))


def pack_pair(src: jnp.ndarray) -> PairSource:
    """1×2-pair-pack `[B, H, W, C]` features (6 slots per row).

    Slot (dy, dx) of pair (y, j) holds src[y+dy, 2j+dx] with the same
    zero fill outside the image as `pack_corners`' shifted copies, so
    out-of-range bilinear corners contribute exactly 0.

    Construction uses only regular data movement (as `pack_superpixel`):
    one minor-axis reshape folds x-even/x-odd into lane blocks, and the
    dy == 1 / dx == 2 slots are whole-array one-row / one-pair shifts of
    those blocks."""
    b, h, w, c = src.shape
    w2 = -(-w // 2)
    pad = jnp.pad(src, ((0, 0), (0, 0), (0, 2 * w2 - w), (0, 0)))
    # [B, H, W2, 2C]: lane blocks x-even, x-odd (contiguous minor fold).
    blk = pad.reshape(b, h, w2, 2 * c)
    # One-pair / one-row shifts with zero fill (pixel 2·w2 / row h is
    # outside the image, so the vacated edge is exactly 0).
    right = jnp.pad(blk[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    below = jnp.pad(blk[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    below_right = jnp.pad(below[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    slots = [
        blk[..., :c], blk[..., c:], right[..., :c],              # dy = 0
        below[..., :c], below[..., c:], below_right[..., :c],    # dy = 1
    ]
    return PairSource(jnp.concatenate(slots, axis=-1), (b, h, w, 4 * c))


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


def _gather_superpixel(packed: SuperpixelSource, flat_idx: jnp.ndarray,
                       w00, w01, w10, w11) -> jnp.ndarray:
    """One row gather of the superpixel table + 9-slot weighted sum.

    The base corner (y, x) = divmod(flat_idx, W) lands in slot
    (y − 2·(y//2), x − 2·(x//2)) of superpixel (y//2, x//2), and corner
    (i, j) of the bilinear footprint in slot (py+i, px+j) — so the four
    tap products w00..w11 scatter to parity-selected slots with 1/0
    factors and every other slot weight is exactly 0. Per element the
    multiplies and the accumulation order are identical to
    `gather_corners`' 4-slot path, so the result is bit-equal."""
    b, h, w, ck = packed.shape
    c = ck // 4
    _, h2, w2, _ = packed.data.shape
    by = flat_idx // w
    bx = flat_idx - by * w
    iy = by // 2
    ix = bx // 2
    sp_idx = iy * w2 + ix
    boff = (jnp.arange(b, dtype=jnp.int32) * (h2 * w2))[:, None] if b > 1 else 0
    table = packed.data.reshape(b * h2 * w2, 9 * c)
    v = _flat_take(table, sp_idx + boff).reshape(b, -1, 9 * c)
    dt = table.dtype
    py = (by - 2 * iy).astype(dt)                    # row parity, 0. or 1.
    px = (bx - 2 * ix).astype(dt)
    oy, ox = 1 - py, 1 - px
    # Slot (dy, dx) weight = w_{dy-py, dx-px} when both in {0, 1}, else 0.
    w9 = (
        oy * ox * w00,
        oy * (ox * w01 + px * w00),
        oy * px * w01,
        ox * (oy * w10 + py * w00),
        oy * ox * w11 + oy * px * w10 + py * ox * w01 + py * px * w00,
        px * (oy * w11 + py * w01),
        py * ox * w10,
        py * (ox * w11 + px * w10),
        py * px * w11,
    )
    out = None
    for k, wk in enumerate(w9):
        term = v[..., k * c:(k + 1) * c] * wk[..., None]
        out = term if out is None else out + term
    return out                                        # [B, P, C]


def _gather_pair(packed: PairSource, flat_idx: jnp.ndarray,
                 w00, w01, w10, w11) -> jnp.ndarray:
    """One row gather of the 1×2-pair table + 6-slot weighted sum.

    The base corner (y, x) = divmod(flat_idx, W) lands in slot
    (0, x − 2·(x//2)) of pair (y, x//2), and corner (i, j) of the
    bilinear footprint in slot (i, px+j) — so the four tap products
    scatter to x-parity-selected slots with 1/0 factors (dy needs no
    parity: pair rows are per-y) and every other slot weight is exactly
    0. Per element the multiplies and the accumulation order are
    identical to `gather_corners`' 4-slot path, so the result is
    bit-equal (same argument as `_gather_superpixel`)."""
    b, h, w, ck = packed.shape
    c = ck // 4
    _, _, w2, _ = packed.data.shape
    by = flat_idx // w
    bx = flat_idx - by * w
    ix = bx // 2
    pr_idx = by * w2 + ix
    boff = (jnp.arange(b, dtype=jnp.int32) * (h * w2))[:, None] if b > 1 else 0
    table = packed.data.reshape(b * h * w2, 6 * c)
    v = _flat_take(table, pr_idx + boff).reshape(b, -1, 6 * c)
    dt = table.dtype
    px = (bx - 2 * ix).astype(dt)                    # x parity, 0. or 1.
    ox = 1 - px
    # Slot (dy, dx) weight = w_{dy, dx-px} when dx-px in {0, 1}, else 0.
    w6 = (
        ox * w00, ox * w01 + px * w00, px * w01,     # dy = 0
        ox * w10, ox * w11 + px * w10, px * w11,     # dy = 1
    )
    out = None
    for k, wk in enumerate(w6):
        term = v[..., k * c:(k + 1) * c] * wk[..., None]
        out = term if out is None else out + term
    return out                                        # [B, P, C]


def gather_corners(packed, flat_idx: jnp.ndarray, w00, w01, w10, w11
                   ) -> jnp.ndarray:
    """Row-gather a 4-corner packed table and apply the bilinear taps.

    Args:
      packed: `PackedSource` / `BandedSource` / `SuperpixelSource` /
        `PairSource` with corners == 4.
      flat_idx: [B, P] int32 base-corner row indices, within-sample.
      w00..w11: [B, P] tap weights, already in the table dtype.

    Returns [B, P, C]. One flat row gather + the corner sum as 4
    contiguous lane-slices (see gather_bilinear for why slices beat a
    corner-axis reduce).
    """
    if isinstance(packed, PairSource):
        return _gather_pair(packed, flat_idx, w00, w01, w10, w11)
    if isinstance(packed, SuperpixelSource):
        return _gather_superpixel(packed, flat_idx, w00, w01, w10, w11)
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
    if banded or isinstance(packed, (SuperpixelSource, PairSource)):
        data = packed.bands[0] if banded else packed.data  # dtype carrier
        table = None                      # corners==4 path handles both
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
