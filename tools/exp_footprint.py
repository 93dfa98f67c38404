"""Measure multi-sample footprint overlap in the iteration sweep.

Round-5 experiment (VERDICT item 1): the iteration sweep gathers one
row per (pixel, sample, view, level) — 10 × H/4·W/4 × (V−1) rows per
GRU iteration (reference models/itermvs.py:84-126 semantics). The four
same-level samples per pixel differ by at most ±2·IS (level 1) /
±8·IS (level 2) of the normalized inverse-depth range
(itermvs.py:231-235, IS = 1/256), so their projected source coords lie
within a few pixels of each other: if a GROUP of samples' bilinear
footprints fits one K×K-pixel window anchored on the source's 2×2
superpixel grid, ONE row gather of a K·K-slot table serves the whole
group — group-size× fewer gathered rows on the dominant gathers.

This tool measures — in pure NumPy, no TPU — the span statistics and
window-fit fractions that decide whether the scheme can engage, on the
same synthetic geometry the bench scores (tests/synthetic_scene.py)
and on DTU-like parametric geometry (real DTU intrinsics/baselines,
Cameras at 1600×1152 eval scale).

Fit condition for a K×K-slot superpixel-anchored window: slots of
anchor superpixel i cover source pixels [2i, 2i+K−1] per axis, a
sample's bilinear footprint is [base, base+1], so a group fits iff on
both axes  2·floor(min_base/2) + K − 2 ≥ max_base  (an even anchor ≤
min_base exists whose window still covers max_base+1).

Usage: python -m tools.exp_footprint [--width 1600 --height 1152]
"""
from __future__ import annotations

import argparse

import numpy as np

IS = 1.0 / 256.0
OFFSETS = {1: (-2.0, -2.0 / 3.0, 2.0 / 3.0, 2.0),
           2: (-8.0, -8.0 / 3.0, 8.0 / 3.0, 8.0),
           3: (-32.0, 32.0)}


def project(rel, xs, ys, depth):
    """Projected source-pixel coords for ref pixels at given depths.

    rel: [4,4] src_proj @ inv(ref_proj) at the SOURCE level scale;
    xs, ys: ref pixel coords already scaled into source-level units;
    depth: [...] depths. Returns (px, py) like ops/warping.py.
    """
    rot, t = rel[:3, :3], rel[:3, 3]
    x = rot[0, 0] * xs + rot[0, 1] * ys + rot[0, 2]
    y = rot[1, 0] * xs + rot[1, 1] * ys + rot[1, 2]
    z = rot[2, 0] * xs + rot[2, 1] * ys + rot[2, 2]
    X = x * depth + t[0]
    Y = y * depth + t[1]
    Z = z * depth + t[2]
    bad = Z <= 1e-2
    return (np.where(bad, 1e9, X / np.where(bad, 1.0, Z)),
            np.where(bad, 1e9, Y / np.where(bad, 1.0, Z)))


def level_proj(K, E_src, E_ref, level, h4, w4, depth):
    """(px, py) on the 1/4 grid sampling the level-`level` source map."""
    scale = 2.0 ** (1 - level)                    # full-res → level scale
    Kl = K.copy().astype(np.float64)
    Kl[:2] *= scale
    P_src = np.eye(4); P_src[:3, :4] = Kl @ E_src[:3, :4]
    P_ref = np.eye(4); P_ref[:3, :4] = Kl @ E_ref[:3, :4]
    rel = P_src @ np.linalg.inv(P_ref)
    # ref grid on the 1/4 grid scaled into source-level pixel units
    # (warping.py:_projection_pixels: arange(w4) * (w_l / w4)).
    h_l = int(round(h4 * 4 * scale)) ; w_l = int(round(w4 * 4 * scale))
    xs = np.arange(w4, dtype=np.float64)[None, :] * (w_l / w4)
    ys = np.arange(h4, dtype=np.float64)[:, None] * (h_l / h4)
    xs, ys = np.broadcast_arrays(xs, ys)
    return project(rel, xs[None], ys[None], depth)


def fits(min_b, max_b, k):
    """Window-fit condition per axis (see module docstring)."""
    return 2 * np.floor(min_b / 2.0) + k - 2 >= max_b


def group_stats(px, py, groups, label, out):
    """px, py: [N, H, W] over samples. Groups: list of sample-index
    tuples sharing one row. Reports span and K-fit fractions."""
    for g in groups:
        bx = np.floor(px[list(g)])
        by = np.floor(py[list(g)])
        span_x = bx.max(0) - bx.min(0)
        span_y = by.max(0) - by.min(0)
        span = np.maximum(span_x, span_y)
        line = (f"  {label} group {g}: span p50={np.percentile(span, 50):.1f} "
                f"p95={np.percentile(span, 95):.1f} p99={np.percentile(span, 99):.1f}")
        for k in (3, 4, 5, 6):
            ok = (fits(bx.min(0), bx.max(0), k) & fits(by.min(0), by.max(0), k))
            line += f" | {k}x{k}: {ok.mean():.4f}"
        out.append(line)


def sweep_stats(name, cams, depth_ref, dmin, dmax, h4, w4, nd_center=None):
    """Span/fit statistics for the iteration sweep around GT depth."""
    out = [f"== {name}: grid {w4}x{h4} (1/4), depth {dmin}-{dmax} =="]
    idmin, idmax = 1.0 / dmin, 1.0 / dmax
    # normalized inverse depth of the (GT-ish) current estimate
    nd = ((1.0 / np.maximum(depth_ref, 1e-9)) - idmax) / (idmin - idmax)
    if nd_center is not None:
        nd = np.full_like(nd, nd_center)
    K, E_ref = cams[0]
    for level in (1, 2, 3):
        offs = np.asarray(OFFSETS[level]) * IS
        s = np.clip(nd[None] + offs[:, None, None], 0.0, 1.0)
        depth_s = 1.0 / (idmax + s * (idmin - idmax))        # [N, H, W]
        for v in range(1, len(cams)):
            _, E_src = cams[v]
            px, py = level_proj(K, E_src, E_ref, level, h4, w4, depth_s)
            n = len(offs)
            quad = [tuple(range(n))]
            pairs = ([(0, 1), (2, 3)] if n == 4 else [(0, 1)])
            group_stats(px, py, quad, f"L{level} v{v} quad", out)
            group_stats(px, py, pairs, f"L{level} v{v} pair", out)
    return "\n".join(out)


def init_stats(name, cams, dmin, dmax, h8, w8, group=4):
    """Init sweep: 32 uniform inverse-depth samples at 1/8 on level 3."""
    out = [f"== {name} init sweep (32 samples @1/8, groups of {group}) =="]
    idmin, idmax = 1.0 / dmin, 1.0 / dmax
    frac = np.arange(32) / 31.0
    depth_s = (1.0 / (idmax + frac * (idmin - idmax)))[:, None, None]
    depth_s = np.broadcast_to(depth_s, (32, h8, w8))
    K, E_ref = cams[0]
    for v in range(1, len(cams)):
        _, E_src = cams[v]
        # level-3 source sampled from the 1/8 grid: scale=2**(1-3)=1/4 …
        # init runs on the 1/8 grid against the level-3 (1/8) source.
        Kl = K.copy().astype(np.float64); Kl[:2] *= 0.125
        P_src = np.eye(4); P_src[:3, :4] = Kl @ E_src[:3, :4]
        P_ref = np.eye(4); P_ref[:3, :4] = Kl @ E_ref[:3, :4]
        rel = P_src @ np.linalg.inv(P_ref)
        xs = np.arange(w8, dtype=np.float64)[None, :]
        ys = np.arange(h8, dtype=np.float64)[:, None]
        xs, ys = np.broadcast_arrays(xs, ys)
        px, py = project(rel, xs[None], ys[None], depth_s)
        groups = [tuple(range(i, i + group)) for i in range(0, 32, group)]
        group_stats(px, py, groups[:3] + groups[-1:], f"init v{v}", out)
        # consecutive-sample step along the epipolar line
        step = np.hypot(np.diff(px, axis=0), np.diff(py, axis=0))
        out.append(f"  init v{v}: consecutive step px p50="
                   f"{np.percentile(step, 50):.2f} p95={np.percentile(step, 95):.2f}")
    return "\n".join(out)


def dtu_like_cams(width, height, baselines):
    """Parametric DTU-like rig: real DTU intrinsics (fx≈2892 at
    1600×1200, rescaled to the eval size like data/dtu_eval.py), sources
    translated by the given baselines (meters→DTU mm units)."""
    K = np.array([[2892.33 * width / 1600.0, 0, 823.2 * width / 1600.0],
                  [0, 2883.17 * height / 1200.0, 619.07 * height / 1200.0],
                  [0, 0, 1.0]])
    cams = [(K, np.eye(4))]
    rng = np.random.RandomState(7)
    for i, b in enumerate(baselines):
        ang = rng.uniform(-0.05, 0.05, 3)
        cx, cy, cz = np.cos(ang); sx, sy, sz = np.sin(ang)
        R = (np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
             @ np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
             @ np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]]))
        E = np.eye(4); E[:3, :3] = R
        E[:3, 3] = [b * (-1) ** i, rng.uniform(-0.2, 0.2) * b, rng.uniform(-0.1, 0.1) * b]
        cams.append((K, E))
    return cams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--height", type=int, default=1152)
    args = ap.parse_args()
    w4, h4 = args.width // 4, args.height // 4
    w8, h8 = args.width // 8, args.height // 8

    # 1) The bench's synthetic geometry (plane at Z0, cameras from
    #    tests/synthetic_scene.make_cameras).
    from tests.synthetic_scene import make_cameras, render_view, DEPTH_MIN, DEPTH_MAX
    rng = np.random.RandomState(0)
    cams = make_cameras(5, args.width, args.height, rng)
    K, E = cams[0]
    _, depth = render_view(K, E, args.width, args.height)
    depth4 = depth[::4, ::4][:h4, :w4].astype(np.float64)
    print(sweep_stats(f"synthetic {args.width}x{args.height}", cams, depth4,
                      DEPTH_MIN, DEPTH_MAX, h4, w4))
    print(init_stats("synthetic", cams, DEPTH_MIN, DEPTH_MAX, h8, w8))

    # 2) DTU-like parametric rig at the repo's eval scale: depth range
    #    425-935 mm (standard DTU cam files), neighbor baselines tens
    #    of mm (DTU gantry spacing).
    for B in (20.0, 40.0, 80.0):
        cams = dtu_like_cams(args.width, args.height, [B, B * 1.2, B * 0.8, B * 1.5])
        gt = np.full((h4, w4), 600.0)
        print(sweep_stats(f"DTU-like B~{B}mm", cams, gt, 425.0, 935.0, h4, w4))


if __name__ == "__main__":
    main()
