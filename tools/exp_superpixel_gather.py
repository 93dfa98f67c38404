"""Probe: 2x2-superpixel 9-slot packing vs row-banded 4-corner packing.

Hypothesis. At 1600x1152 the level-1 corner-packed table has 460800
rows — above the fast-gather row limit (FAST_GATHER_MAX_ROWS = 262144,
see ops/grid_sample.py) — so `pack_corners_fast` splits it into 2 row
bands and every warp gathers BOTH bands with masked indices: 2x the
gather rows, each at the fast rate. A 2x2-superpixel packing stores one
row per superpixel holding the 3x3 pixel neighborhood (9 slots x C):
any bilinear footprint (base corner (y, x), spanning y..y+1, x..x+1)
lies inside the 3x3 neighborhood of superpixel (y//2, x//2), so ONE
gather of a 115200-row table (under the limit) replaces the two banded
gathers. Cost: 2.25x row bytes (9C vs 4C) and a 9-slot weighted sum
with parity-selected taps — but gathers measured row-latency bound,
not byte bound (see the fp8 probe notes in docs/PERFORMANCE.md), so
halving gathered rows should win if the rate holds at 9C-wide rows.

Run on the real TPU; in-jit fori_loop amortization (single-op wall
timings over the tunnel are dispatch-dominated). Indices are spatially
smooth like real sweep indices (the fp8 probe showed random-index
rates are 2-6x pessimistic).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from itermvs_tpu.ops.grid_sample import (
    pack_corners_fast, gather_corners, _axis_taps)

ITERS = 24


def pack_superpixel(src: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, ceil(H/2), ceil(W/2), 9C].

    Slot (dy, dx), dy, dx in {0, 1, 2}, of superpixel (i, j) holds
    src[2i+dy, 2j+dx], zero-filled outside the image (same zero-fill
    semantics as pack_corners' shifted copies)."""
    b, h, w, c = src.shape
    h2, w2 = -(-h // 2), -(-w // 2)
    # Pad so every slot slice is a full [h2, w2] stride-2 view.
    pad = jnp.pad(src, ((0, 0), (0, 2 * h2 + 1 - h), (0, 2 * w2 + 1 - w),
                        (0, 0)))
    slots = [pad[:, dy:dy + 2 * h2:2, dx:dx + 2 * w2:2]
             for dy in (0, 1, 2) for dx in (0, 1, 2)]
    return jnp.concatenate(slots, axis=-1)                  # [B,h2,w2,9C]


def superpixel_taps(by, bx, wy_a, wy_b, wx_a, wx_b, h2, w2):
    """Base-corner int coords + 2-tap axis weights -> superpixel flat
    index + 9 slot weights (parity-selected, pure elementwise)."""
    iy, ix = by // 2, bx // 2
    py = (by - 2 * iy).astype(wy_a.dtype)                   # 0. or 1.
    px = (bx - 2 * ix).astype(wx_a.dtype)
    oy, ox = 1.0 - py, 1.0 - px
    # wy9[d] = py==0 ? [wy_a, wy_b, 0][d] : [0, wy_a, wy_b][d]
    wy9 = (wy_a * oy, wy_b * oy + wy_a * py, wy_b * py)
    wx9 = (wx_a * ox, wx_b * ox + wx_a * px, wx_b * px)
    flat = iy * w2 + ix
    weights = [wy9[dy] * wx9[dx] for dy in (0, 1, 2) for dx in (0, 1, 2)]
    return flat, weights


def gather_superpixel(table2d: jnp.ndarray, flat_idx: jnp.ndarray,
                      weights, c: int) -> jnp.ndarray:
    """One row gather of the [R, 9C] table + 9-slot weighted sum."""
    v = jnp.take(table2d, flat_idx.reshape(-1), axis=0, mode="clip")
    out = None
    for k, wk in enumerate(weights):
        term = v[:, k * c:(k + 1) * c] * wk.reshape(-1)[:, None]
        out = term if out is None else out + term
    return out


def smooth_coords(key, p, h, w, n_steps):
    """[n_steps, P] smooth pixel coords: identity raster + per-step
    smooth disparity (like a sweep's depth-dependent shift)."""
    ys, xs = np.divmod(np.arange(p) % (h * w), w)
    base_y = jnp.asarray(ys, jnp.float32)
    base_x = jnp.asarray(xs, jnp.float32)
    shifts = jax.random.uniform(key, (n_steps, 2), minval=-3.0, maxval=3.0)
    py = base_y[None] + shifts[:, :1] + 0.3 * jnp.sin(base_x[None] / 37.0)
    px = base_x[None] + shifts[:, 1:] + 0.3 * jnp.sin(base_y[None] / 53.0)
    return py, px


def bench_case(name, h, w, c, p, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (1, h, w, c), dtype)
    banded = pack_corners_fast(src)
    kind = type(banded).__name__
    n_bands = len(banded.bands) if hasattr(banded, "bands") else 1
    sp = pack_superpixel(src)
    h2, w2 = sp.shape[1:3]
    sp2d = sp.reshape(h2 * w2, 9 * c)
    py, px = smooth_coords(jax.random.PRNGKey(1), p, h, w, ITERS)

    def taps_of(pyi, pxi):
        by, wy_a, wy_b = _axis_taps(pyi, h)
        bx, wx_a, wx_b = _axis_taps(pxi, w)
        return by, bx, (wy_a.astype(dtype), wy_b.astype(dtype),
                        wx_a.astype(dtype), wx_b.astype(dtype))

    @jax.jit
    def run_banded(py, px):
        def body(i, acc):
            by, bx, (wy_a, wy_b, wx_a, wx_b) = taps_of(py[i], px[i])
            out = gather_corners(banded, (by * w + bx)[None],
                                 (wy_a * wx_a)[None], (wy_a * wx_b)[None],
                                 (wy_b * wx_a)[None], (wy_b * wx_b)[None])
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    @jax.jit
    def run_super(py, px):
        def body(i, acc):
            by, bx, (wy_a, wy_b, wx_a, wx_b) = taps_of(py[i], px[i])
            flat, ws = superpixel_taps(by, bx, wy_a, wy_b, wx_a, wx_b,
                                       h2, w2)
            out = gather_superpixel(sp2d, flat, ws, c)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    # Parity first (one step, f32 reference on host).
    by, bx, (wy_a, wy_b, wx_a, wx_b) = taps_of(py[0], px[0])
    ref = gather_corners(banded, (by * w + bx)[None],
                         (wy_a * wx_a)[None], (wy_a * wx_b)[None],
                         (wy_b * wx_a)[None], (wy_b * wx_b)[None])
    flat, ws = superpixel_taps(by, bx, wy_a, wy_b, wx_a, wx_b, h2, w2)
    got = gather_superpixel(sp2d, flat, ws, c)
    err = float(jnp.max(jnp.abs(ref.reshape(-1, c).astype(jnp.float32)
                                - got.astype(jnp.float32))))

    for fn, label in ((run_banded, f"banded({kind},{n_bands})"),
                      (run_super, "superpixel9")):
        fn(py, px).block_until_ready()
        t0 = time.perf_counter()
        r = fn(py, px)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS
        rate = dt / p * 1e9
        print(f"{name:34s} {label:26s} {dt*1e3:8.3f} ms/warp "
              f"{rate:6.2f} ns/idx", flush=True)
    print(f"{name:34s} parity max|diff| = {err:.3e}", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    # level-1 @ 1600x1152: the banding-limit case the probe targets.
    bench_case("L1 1600x1152 [576,800,16] P=460800", 576, 800, 16, 460800)
    # level-1 @ 1152x864: under the limit; superpixel should be neutral
    # or lose (no row saving, 2.25x bytes).
    bench_case("L1 1152x864 [432,576,16] P=248832", 432, 576, 16, 248832)
    # level-2 @ 1600x1152 (under limit, wider rows).
    bench_case("L2 1600x1152 [288,400,32] P=460800", 288, 400, 32, 460800)
