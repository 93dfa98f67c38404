"""Synthetic MVS scene builder for tests.

Renders a textured fronto-parallel world plane (z = Z0) from several
pinhole cameras with analytically exact per-view depth maps, and writes
a custom-format scene directory (pair.txt, images/, cams_1/) plus
optional GT depth PFMs — enough to exercise loaders, the eval driver
and fusion with known geometry.
"""
from __future__ import annotations

import os

import numpy as np

from itermvs_tpu.io import save_pfm, write_cam_file, write_pair_file

Z0 = 5.0
DEPTH_MIN, DEPTH_MAX = 2.0, 10.0


_NOISE_RES = 512
_NOISE = np.random.RandomState(1234).rand(3, _NOISE_RES, _NOISE_RES).astype(np.float64)


def _value_noise(channel, u, v):
    """Bilinear lookup into a fixed random grid (non-periodic texture)."""
    grid = _NOISE[channel]
    u = np.clip(u, 0, _NOISE_RES - 1.001)
    v = np.clip(v, 0, _NOISE_RES - 1.001)
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    fu = u - u0
    fv = v - v0
    return ((grid[v0, u0] * (1 - fu) + grid[v0, u0 + 1] * fu) * (1 - fv)
            + (grid[v0 + 1, u0] * (1 - fu) + grid[v0 + 1, u0 + 1] * fu) * fv)


def _texture(x, y):
    """Multi-octave non-periodic value-noise texture.

    Photometric matching needs unambiguous (non-repeating) detail at
    the few-pixel scale: at the test cameras one world unit ≈ 30-60 px,
    so octaves at 8/24/64 noise-cells per world unit give structure
    from coarse blobs down to ~1-pixel speckle.
    """
    out = []
    for c in range(3):
        val = (0.5 * _value_noise(c, 8 * x + 77, 8 * y + 77)
               + 0.3 * _value_noise(c, 24 * x + 200, 24 * y + 150)
               + 0.2 * _value_noise(c, 64 * x + 300, 64 * y + 350))
        out.append(val)
    return np.clip(np.stack(out, axis=-1), 0.0, 1.0)


def make_cameras(num_views, width, height, rng):
    """Ref camera at origin; sources slightly translated/rotated."""
    K = np.array([[width * 1.2, 0, width / 2],
                  [0, width * 1.2, height / 2],
                  [0, 0, 1]], np.float32)
    cams = []
    for v in range(num_views):
        if v == 0:
            E = np.eye(4, dtype=np.float32)
        else:
            angle = rng.uniform(-0.02, 0.02, 3)
            cx, cy, cz = np.cos(angle)
            sx, sy, sz = np.sin(angle)
            Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
            Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            E = np.eye(4, dtype=np.float32)
            E[:3, :3] = (Rx @ Ry @ Rz).astype(np.float32)
            E[:3, 3] = [rng.uniform(0.15, 0.4) * (-1) ** v,
                        rng.uniform(-0.1, 0.1), rng.uniform(-0.05, 0.05)]
        cams.append((K.copy(), E))
    return cams


def render_view(K, E, width, height):
    """Returns (rgb [H,W,3] in [0,1], depth [H,W]) for the plane z=Z0."""
    xs, ys = np.meshgrid(np.arange(width, dtype=np.float64),
                         np.arange(height, dtype=np.float64))
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1)          # [H,W,3]
    dirs = pix @ np.linalg.inv(K.astype(np.float64)).T           # cam-space rays
    R = E[:3, :3].astype(np.float64)
    t = E[:3, 3].astype(np.float64)
    cam_center = -R.T @ t
    dirs_world = dirs @ R                                        # R^T applied rowwise
    # Solve (cam_center + s·dir).z = Z0.
    s = (Z0 - cam_center[2]) / dirs_world[..., 2]
    pw = cam_center + s[..., None] * dirs_world
    depth = (s * dirs[..., 2]).astype(np.float32)                # camera-frame z
    rgb = _texture(pw[..., 0], pw[..., 1]).astype(np.float32)
    return rgb, depth


def build_scene_dir(root, num_views=4, width=128, height=96, rng=None,
                    write_gt_depth=True):
    """Write a custom-format scene; returns (cams, depths dict)."""
    from PIL import Image

    rng = rng or np.random.RandomState(0)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "cams_1"), exist_ok=True)

    cams = make_cameras(num_views, width, height, rng)
    depths = {}
    for v, (K, E) in enumerate(cams):
        rgb, depth = render_view(K, E, width, height)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(root, f"images/{v:08d}.jpg"), quality=98)
        write_cam_file(os.path.join(root, f"cams_1/{v:08d}_cam.txt"),
                       K, E, DEPTH_MIN, DEPTH_MAX)
        depths[v] = depth
        if write_gt_depth:
            os.makedirs(os.path.join(root, "depth_est"), exist_ok=True)
            os.makedirs(os.path.join(root, "confidence"), exist_ok=True)
            save_pfm(os.path.join(root, f"depth_est/{v:08d}.pfm"), depth)
            save_pfm(os.path.join(root, f"confidence/{v:08d}.pfm"),
                     np.ones_like(depth))

    pairs = [(v, [(s, 10.0) for s in range(num_views) if s != v])
             for v in range(num_views)]
    write_pair_file(os.path.join(root, "pair.txt"), pairs)
    return cams, depths
