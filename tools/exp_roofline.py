"""Gather roofline: achieved sweep-gather rate vs locality ceilings.

Round-5 floor proof (VERDICT item 1): the device trace attributes
~26.8 ms/step at 1152×864 to the sweep's row gathers (~9.7 M rows at
~2.8 ns/row). Whether that is an algorithmic floor depends on what a
TPU dynamic row-gather CAN do at identical shapes and index locality.
This probe times `jnp.take` (+ the in-context corner-sum epilogue) at
the exact sweep shapes under three index regimes:

  real   — actual sweep indices from the synthetic-scene geometry
           (projectively smooth, the in-context distribution);
  seq    — iota indices (pure streaming; the unattainable best case
           for a dynamic gather: perfect locality AND unit stride);
  rand   — uniform random rows (locality-free worst case).

If real ≈ seq, the in-context gathers already run at the hardware's
best dynamic-gather rate for those shapes — the cost is then a
property of ROW COUNT (algorithmic), not of schedule or layout, and
the only remaining lever is gathering fewer rows. Pair that with
tools/exp_footprint.py (measured: the 4 same-level samples' bilinear
footprints do NOT fit shared superpixel windows at realistic DTU
baselines — quad 3×3 fit ≈ 0-6%, level 3 spans 5-30 px), and the
row count itself is fixed by the algorithm's sampling pattern.

Run on one real TPU chip: python -m tools.exp_roofline
"""
from __future__ import annotations

import time

import numpy as np

from itermvs_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

REPS = 20
HBM_GBPS = 819.0   # v5e peak HBM bandwidth (public spec), for context

IS = 1.0 / 256.0
OFFSETS = {1: (-2.0, -2.0 / 3.0, 2.0 / 3.0, 2.0),
           2: (-8.0, -8.0 / 3.0, 8.0 / 3.0, 8.0),
           3: (-32.0, 32.0)}


def _real_indices(level, width, height, view, init=False):
    """Flat gather indices exactly as the sweep issues them
    ([N, H, W]-ordered base-corner rows, ops/warping.py math) on the
    synthetic-scene geometry at GT-centered samples."""
    from tests.synthetic_scene import (DEPTH_MAX, DEPTH_MIN, Z0,
                                       make_cameras)
    from tools.exp_footprint import level_proj, project

    cams = make_cameras(5, width, height, np.random.RandomState(0))
    idmin, idmax = 1.0 / DEPTH_MIN, 1.0 / DEPTH_MAX
    K, E_ref = cams[0]
    _, E_src = cams[view]
    if init:
        h8, w8 = height // 8, width // 8
        frac = np.arange(32) / 31.0
        depth_s = np.broadcast_to(
            (1.0 / (idmax + frac * (idmin - idmax)))[:, None, None],
            (32, h8, w8))
        Kl = K.copy().astype(np.float64); Kl[:2] *= 0.125
        P_src = np.eye(4); P_src[:3, :4] = Kl @ E_src[:3, :4]
        P_ref = np.eye(4); P_ref[:3, :4] = Kl @ E_ref[:3, :4]
        rel = P_src @ np.linalg.inv(P_ref)
        xs = np.arange(w8, dtype=np.float64)[None, :]
        ys = np.arange(h8, dtype=np.float64)[:, None]
        xs, ys = np.broadcast_arrays(xs, ys)
        px, py = project(rel, xs[None], ys[None], depth_s)
        h_l, w_l = h8, w8
    else:
        h4, w4 = height // 4, width // 4
        nd = ((1.0 / Z0) - idmax) / (idmin - idmax)
        offs = np.asarray(OFFSETS[level]) * IS
        s = np.clip(nd + offs[:, None, None], 0.0, 1.0)
        depth_s = np.broadcast_to(1.0 / (idmax + s * (idmin - idmax)),
                                  (len(offs), h4, w4))
        px, py = level_proj(K, E_src, E_ref, level, h4, w4, depth_s)
        scale = 2.0 ** (1 - level)
        h_l, w_l = int(height * scale), int(width * scale)
    bx = np.clip(np.floor(px), 0, w_l - 1).astype(np.int64)
    by = np.clip(np.floor(py), 0, h_l - 1).astype(np.int64)
    return (by * w_l + bx).reshape(-1).astype(np.int32)


def probe(name, rows_table, row_lanes, idx_np, iters=30):
    rows_out = idx_np.shape[0]
    rng = np.random.RandomState(0)
    table = jnp.asarray(
        rng.rand(rows_table, row_lanes).astype(np.float32) * 2 - 1,
        jnp.bfloat16)
    idx = jnp.asarray(np.clip(idx_np, 0, rows_table - 1), jnp.int32)
    taps = [jnp.asarray(rng.rand(rows_out).astype(np.float32), jnp.bfloat16)
            for _ in range(4)]
    c = row_lanes // 4

    def body(table, idx, k):
        v = jnp.take(table, (idx + k) % rows_table, axis=0, mode="clip")
        return (v[:, 0 * c:1 * c] * taps[0][:, None]
                + v[:, 1 * c:2 * c] * taps[1][:, None]
                + v[:, 2 * c:3 * c] * taps[2][:, None]
                + v[:, 3 * c:4 * c] * taps[3][:, None])

    @jax.jit
    def loop(table, idx):
        return jax.lax.fori_loop(
            0, REPS,
            lambda k, acc: acc + body(table, idx, k).astype(jnp.float32).sum(),
            jnp.float32(0.0))

    out = loop(table, idx)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = loop(table, idx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (iters * REPS)
    gathered_gb = rows_out * row_lanes * 2 / 1e9
    ns_row = dt / rows_out * 1e9
    print(f"{name:36s} {dt * 1e3:7.3f} ms  {ns_row:5.2f} ns/row"
          f"  {gathered_gb / dt:6.0f} GB/s ({gathered_gb / dt / HBM_GBPS:4.0%} HBM)")
    return ns_row


def suite(width, height):
    """All sweep gather classes at one resolution; returns the summary
    {class: {regime: ns/row}} dict."""
    h4w4 = (height // 4) * (width // 4)
    h8w8 = (height // 8) * (width // 8)
    l1 = ((height // 2) * (width // 2), 64, 4 * h4w4, 1, False)
    l2 = (h4w4, 128, 4 * h4w4, 2, False)
    l3 = (h8w8, 192, 2 * h4w4, 3, False)
    init = (h8w8, 192, 32 * h8w8, 3, True)
    results = {}
    for cls, (rows_t, lanes, rows_o, level, is_init) in (
            ("L1_iter", l1), ("L2_iter", l2), ("L3_iter", l3), ("init", init)):
        real = _real_indices(level, width, height, view=1, init=is_init)
        assert real.shape[0] == rows_o, (cls, real.shape, rows_o)
        rng = np.random.RandomState(1)
        regimes = {
            "real": real,
            "seq": (np.arange(rows_o) % rows_t).astype(np.int32),
            "rand": rng.randint(0, rows_t, size=rows_o).astype(np.int32),
        }
        results[cls] = {}
        for reg, idx_np in regimes.items():
            label = f"{cls} [{rows_t},{lanes}] x{rows_o} {reg}"
            results[cls][reg] = probe(label, rows_t, lanes, idx_np)
    return results


def main():
    print(f"devices: {jax.devices()}")
    for width, height in ((1152, 864), (1600, 1152)):
        print(f"--- {width}x{height} ---")
        res = suite(width, height)
        # Step-level floor: per-class rows × per-view-iter multiplicity.
        h4w4 = (height // 4) * (width // 4)
        h8w8 = (height // 8) * (width // 8)
        counts = {"L1_iter": 4 * h4w4 * 4 * 4, "L2_iter": 4 * h4w4 * 4 * 4,
                  "L3_iter": 2 * h4w4 * 4 * 4, "init": 32 * h8w8 * 4}
        for reg in ("real", "seq", "rand"):
            total = sum(res[c][reg] * counts[c] for c in counts) / 1e6
            print(f"  step gather total @{reg}-index rate: {total:6.1f} ms"
                  f" ({sum(counts.values()) / 1e6:.1f} M rows)")


if __name__ == "__main__":
    main()
