"""Probe: does chunking sweep gathers on sample boundaries re-fuse the
epilogue at 1600×1152?

The round-5 device trace at 1600×1152 shows the sweep gathers emitting
their RAW gathered blocks to HBM ([460800,144] / [460800,128] /
[921600,192]) followed by separate column-major copies (~22 ms/step),
separate tap-sum fusions and 6-D reshapes — whereas at 1152×864 the
tap sum stays inside the gather fusion and only the group-mean
relayout materializes. The output row counts differ exactly across the
262144-row (2^15 8-row sublane tiles) boundary that already governs
TABLE residency: 248832 ≤ 262144 < 460800.

Variants, timed with the repo's real gather/corr functions:
  mono  — one gather of all samples' rows (current code);
  chunk — one gather per ≤262144-row sample group, epilogue per chunk,
          concat at the end (identical math, same total rows).

Run: python -m tools.exp_sample_chunk
"""
from __future__ import annotations

import time

import numpy as np

from itermvs_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from itermvs_tpu.ops.grid_sample import gather_corners, pack_corners_fast
from itermvs_tpu.ops.warping import group_corr

REPS = 10


def probe(name, src_hw, c, out_px, n_samples, chunk_samples, iters=20,
          seed=0):
    """Time gather+taps+group-mean for one (view, level) warp shape."""
    rng = np.random.RandomState(seed)
    h1, w1 = src_hw
    src = jnp.asarray(rng.rand(1, h1, w1, c).astype(np.float32) * 2 - 1,
                      jnp.bfloat16)
    packed = jax.jit(pack_corners_fast)(src)
    h, w = out_px
    n = n_samples
    # Smooth, realistic indices: a projective-ish flow field.
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    idxs, taps = [], []
    for s in range(n):
        px = np.clip(xs * (w1 / w) + 3.1 * s + 7.3, 0, w1 - 1)
        py = np.clip(ys * (h1 / h) + 1.7 * s + 2.9, 0, h1 - 1)
        bx, by = np.floor(px), np.floor(py)
        idxs.append((by * w1 + bx).astype(np.int32).ravel())
        fx, fy = px - bx, py - by
        taps.append(np.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                              fy * (1 - fx), fy * fx]).astype(np.float32))
    idx = jnp.asarray(np.stack(idxs))                       # [N, P]
    tap = jnp.asarray(np.stack(taps), jnp.bfloat16)         # [N, 4, P]
    ref = jnp.asarray(rng.rand(1, h, w, c).astype(np.float32), jnp.bfloat16)

    def warp(packed, idx_flat, taps_flat, n_s):
        warped = gather_corners(
            packed, idx_flat.reshape(1, -1),
            *[t.reshape(1, -1) for t in taps_flat]
        ).reshape(1, n_s, h, w, c)
        return group_corr(warped, ref, 8)

    def mono(packed):
        return warp(packed, idx, [tap[:, k] for k in range(4)], n)

    def chunk(packed):
        outs = []
        for s0 in range(0, n, chunk_samples):
            s1 = min(s0 + chunk_samples, n)
            outs.append(warp(packed, idx[s0:s1],
                             [tap[s0:s1, k] for k in range(4)], s1 - s0))
        return jnp.concatenate(outs, axis=1)

    for label, fn in (("mono", mono), ("chunk", chunk)):
        @jax.jit
        def loop(packed, fn=fn):
            def body(k, acc):
                return acc + fn(packed).sum()
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        out = loop(packed)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = loop(packed)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (iters * REPS)
        rows = n * h * w
        print(f"{name:28s} {label:5s} {dt * 1e3:7.3f} ms "
              f"{dt / rows * 1e9:5.2f} ns/row")


def main():
    print(f"devices: {jax.devices()}")
    print("--- 1600x1152 shapes (out grid 400x288) ---")
    probe("L1 superpixel [800x576]x4s", (576, 800), 16, (288, 400), 4, 2)
    probe("L2 packed [400x288]x4s", (288, 400), 32, (288, 400), 4, 2)
    probe("L3 packed [200x144]x2s", (144, 200), 48, (288, 400), 2, 1)
    probe("init [200x144]x32s@1/8", (144, 200), 48, (144, 200), 32, 8)
    print("--- 1152x864 shapes (out grid 288x216) ---")
    probe("L1 packed [576x432]x4s", (432, 576), 16, (216, 288), 4, 2)
    probe("init [144x108]x32s@1/8", (108, 144), 48, (108, 144), 32, 16)


if __name__ == "__main__":
    main()
