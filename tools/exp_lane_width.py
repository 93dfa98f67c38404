"""Probe: gather cost vs row lane width (lane-tile alignment).

Round-5 trace at 1600×1152 shows the level-2 gathers ([115200, 128]
tables — rows exactly one 128-lane tile) running at 1.86 ns/row while
the level-1 superpixel ([115200, 144] — 1.125 tiles) and level-3/init
([28800, 192] — 1.5 tiles) gathers run at ~3.2 ns/row. Hypothesis: a
dynamic row gather pays per lane TILE touched, so rows that are not a
multiple of 128 lanes waste a large fraction of the second tile.

Sweep lane width at fixed (table rows, out rows) with sweep-realistic
smooth indices, and A/B the candidate repacking for oversized level-1
tables: 1×2-superpixel 6-slot rows ([H·W/2, 6C] = 96 lanes at C=16,
one tile) vs the in-tree 2×2-superpixel 9-slot rows ([H·W/4, 9C] =
144 lanes). Run: python -m tools.exp_lane_width
"""
from __future__ import annotations

import time

import numpy as np

from itermvs_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

REPS = 20


def probe(name, rows_table, lanes, idx_np, iters=20):
    """Gather + per-row weighted slice-sum (the in-context consumer
    shape, same body as tools/exp_fp8_gather.py — a bare sum(gather)
    gets algebraically eliminated by XLA and times at fantasy rates)."""
    rows_out = idx_np.shape[0]
    rng = np.random.RandomState(0)
    table = jnp.asarray(
        rng.rand(rows_table, lanes).astype(np.float32) * 2 - 1, jnp.bfloat16)
    idx = jnp.asarray(np.clip(idx_np, 0, rows_table - 1), jnp.int32)
    taps = [jnp.asarray(rng.rand(rows_out).astype(np.float32), jnp.bfloat16)
            for _ in range(4)]
    c = lanes // 4

    @jax.jit
    def loop(table, idx):
        def body(k, acc):
            v = jnp.take(table, (idx + k) % rows_table, axis=0, mode="clip")
            r = (v[:, 0 * c:1 * c] * taps[0][:, None]
                 + v[:, 1 * c:2 * c] * taps[1][:, None]
                 + v[:, 2 * c:3 * c] * taps[2][:, None]
                 + v[:, 3 * c:4 * c] * taps[3][:, None])
            return acc + r.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    out = loop(table, idx)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = loop(table, idx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (iters * REPS)
    print(f"{name:42s} {dt * 1e3:7.3f} ms  {dt / rows_out * 1e9:5.2f} ns/row"
          f"  {rows_out * lanes * 2 / dt / 1e9:6.0f} GB/s")
    return dt / rows_out * 1e9


def main():
    print(f"devices: {jax.devices()}")
    from tools.exp_roofline import _real_indices

    # Level-1 @1600×1152: base-corner indices into the [576, 800] map.
    real = _real_indices(1, 1600, 1152, view=1)          # [4·115200] rows
    h1, w1 = 576, 800
    by, bx = real // w1, real % w1

    print("-- lane-width sweep at fixed rows ([115200, L] table, "
          "460800 out rows, superpixel indices) --")
    sp = (by // 2) * (w1 // 2) + (bx // 2)
    for lanes in (64, 96, 128, 144, 160, 192, 256):
        probe(f"[115200,{lanes}]", 115200, lanes, sp)

    print("-- candidate packings for oversized L1 (C=16) --")
    # in-tree: 2×2 superpixel, 9 slots, 144 lanes, H·W/4 rows
    probe("9-slot 2x2 sp [115200,144]", 115200, 144, sp)
    # candidate: 1×2 pair, 6 slots, 96 lanes, H·W/2 rows
    pair = by * (w1 // 2) + (bx // 2)
    probe("6-slot 1x2 pair [230400,96]", 230400, 96, pair)
    # strawman: flat corner-packed above the row limit (what banding
    # replaced) for context
    probe("4-corner flat [460800,64]", 460800, 64, real)

    print("-- level-3/init row widths (C=48) at the init shape --")
    init = _real_indices(3, 1600, 1152, view=1, init=True)  # 921600 rows
    h8w8 = (1152 // 8) * (1600 // 8)
    for lanes in (128, 192, 256):
        probe(f"[{h8w8},{lanes}] x921600", h8w8, lanes, init)


if __name__ == "__main__":
    main()
