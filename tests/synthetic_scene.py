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


# Composite-scene geometry ("sphere_step"): a textured sphere floating in
# front of a stepped background plane. Occlusion between views and two
# kinds of depth discontinuity (curved silhouette + axis-aligned step)
# exercise exactly the cases a single fronto-parallel plane cannot.
SPHERE_CENTER = np.array([0.35, -0.25, Z0 - 1.4], np.float64)
SPHERE_RADIUS = 0.9
STEP_X = -0.4          # world x of the background step edge
STEP_DZ = 0.8          # far half-plane sits at Z0 + STEP_DZ for x < STEP_X


def render_view(K, E, width, height, scene: str = "plane"):
    """Returns (rgb [H,W,3] in [0,1], depth [H,W]) for the given scene.

    scene="plane": the plane z=Z0 (original fixture).
    scene="sphere_step": nearest-hit composition of a sphere and a
    stepped background plane; every surface carries the same world-
    anchored texture, so multi-view photometric matching stays exact.
    """
    xs, ys = np.meshgrid(np.arange(width, dtype=np.float64),
                         np.arange(height, dtype=np.float64))
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1)          # [H,W,3]
    dirs = pix @ np.linalg.inv(K.astype(np.float64)).T           # cam-space rays
    R = E[:3, :3].astype(np.float64)
    t = E[:3, 3].astype(np.float64)
    cam_center = -R.T @ t
    dirs_world = dirs @ R                                        # R^T applied rowwise

    def plane_hit(z_plane, half=None):
        s = (z_plane - cam_center[2]) / dirs_world[..., 2]
        pw = cam_center + s[..., None] * dirs_world
        if half == "near":      # x >= STEP_X half-plane at Z0
            s = np.where(pw[..., 0] >= STEP_X, s, np.inf)
        elif half == "far":     # x < STEP_X half-plane at Z0 + STEP_DZ
            s = np.where(pw[..., 0] < STEP_X, s, np.inf)
        return s

    if scene == "plane":
        s_hit = plane_hit(Z0)
    else:
        # Sphere: |o + s·d − C|² = r², smallest positive root.
        oc = cam_center - SPHERE_CENTER
        b = np.einsum("hwc,c->hw", dirs_world, oc)
        a = np.einsum("hwc,hwc->hw", dirs_world, dirs_world)
        disc = b * b - a * (oc @ oc - SPHERE_RADIUS ** 2)
        s_sph = np.where(disc >= 0, (-b - np.sqrt(np.maximum(disc, 0.0))) / a,
                         np.inf)
        s_sph = np.where(s_sph > 0, s_sph, np.inf)
        s_hit = np.minimum(np.minimum(plane_hit(Z0, "near"),
                                      plane_hit(Z0 + STEP_DZ, "far")), s_sph)

    pw = cam_center + s_hit[..., None] * dirs_world
    depth = (s_hit * dirs[..., 2]).astype(np.float32)            # camera-frame z
    if scene == "plane":
        # Exact round-1 texture (several tests/benches calibrate
        # pixel-level tolerances on this fixture — keep it bit-stable).
        rgb = _texture(pw[..., 0], pw[..., 1]).astype(np.float32)
    else:
        # World-anchored texture with a z-dependent shift: the sphere
        # and the stepped background get distinct texture even where
        # they project to nearby (x, y).
        rgb = _texture(pw[..., 0] + 0.731 * pw[..., 2],
                       pw[..., 1] + 0.517 * pw[..., 2]).astype(np.float32)
    return rgb, depth


def build_scene_dir(root, num_views=4, width=128, height=96, rng=None,
                    write_gt_depth=True, scene: str = "plane"):
    """Write a custom-format scene; returns (cams, depths dict)."""
    from PIL import Image

    rng = rng or np.random.RandomState(0)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "cams_1"), exist_ok=True)

    cams = make_cameras(num_views, width, height, rng)
    depths = {}
    for v, (K, E) in enumerate(cams):
        rgb, depth = render_view(K, E, width, height, scene=scene)
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


def gt_point_cloud(cams, depths, stride: int = 2) -> np.ndarray:
    """Visible-surface GT cloud: back-project every view's analytic
    depth map to world space (the union over views is exactly the
    surface any fused reconstruction can see)."""
    pts = []
    for v, (K, E) in enumerate(cams):
        depth = depths[v][::stride, ::stride].astype(np.float64)
        h, w = depth.shape
        xs, ys = np.meshgrid(np.arange(w) * stride, np.arange(h) * stride)
        pix = np.stack([xs * depth, ys * depth, depth], axis=-1).reshape(-1, 3)
        k_inv = np.linalg.inv(K.astype(np.float64))
        e_inv = np.linalg.inv(E.astype(np.float64))
        cam_pts = pix @ k_inv.T
        world = cam_pts @ e_inv[:3, :3].T + e_inv[:3, 3]
        pts.append(world)
    return np.concatenate(pts).astype(np.float32)


def build_dtu_training_dir(root, num_views=5, num_refs=1, scan="scan1",
                           rng=None):
    """Write a miniature DTU-training-layout dataset (analytic plane scene).

    Layout matches itermvs_tpu.data.dtu / reference datasets/dtu_yao.py:
      Cameras_1/pair.txt
      Cameras_1/{scan}_train/{v:08d}_cam.txt     (K stored at 1/4 res)
      Rectified/{scan}_train/rect_{v+1:03d}_{light}_r5000.png  (640x512)
      Depths_raw/{scan}/depth_map_{v:04d}.pfm    (1600x1200)
      Depths_raw/{scan}/depth_visual_{v:04d}.png (1600x1200 mask)

    Depth maps are rendered at 1600x1200 with intrinsics chosen so the
    loader's half-scale + 640x512 center crop aligns exactly with the
    640x512 images (crop offsets sw=80, sh=44 at the 800x600 scale).
    """
    from PIL import Image

    rng = rng or np.random.RandomState(0)
    iw, ih = 640, 512
    dw, dh = 1600, 1200
    cams = make_cameras(num_views, iw, ih, rng)

    cam_dir = os.path.join(root, f"Cameras_1/{scan}_train")
    img_dir = os.path.join(root, f"Rectified/{scan}_train")
    dep_dir = os.path.join(root, f"Depths_raw/{scan}")
    for d in (cam_dir, img_dir, dep_dir):
        os.makedirs(d, exist_ok=True)

    for v, (K, E) in enumerate(cams):
        rgb, _ = render_view(K, E, iw, ih)
        img = Image.fromarray((rgb * 255).astype(np.uint8))
        for light in range(7):
            img.save(os.path.join(img_dir, f"rect_{v + 1:0>3}_{light}_r5000.png"))

        # Depth intrinsics: half-scale then crop (80, 44) recovers K.
        Kd = K.copy()
        Kd[0, 0] *= 2.0
        Kd[1, 1] *= 2.0
        Kd[0, 2] = 2.0 * (K[0, 2] + 80.0)
        Kd[1, 2] = 2.0 * (K[1, 2] + 44.0)
        _, depth_hr = render_view(Kd, E, dw, dh)
        save_pfm(os.path.join(dep_dir, f"depth_map_{v:0>4}.pfm"), depth_hr)
        Image.fromarray(np.full((dh, dw), 255, np.uint8)).save(
            os.path.join(dep_dir, f"depth_visual_{v:0>4}.png"))

        write_cam_file(os.path.join(cam_dir, f"{v:0>8}_cam.txt"),
                       K / np.array([[4.0], [4.0], [1.0]]), E,
                       DEPTH_MIN, DEPTH_MAX)

    pairs = [(r, [(s, 10.0) for s in range(num_views) if s != r])
             for r in range(num_refs)]
    write_pair_file(os.path.join(root, "Cameras_1/pair.txt"), pairs)

    list_path = os.path.join(root, "list.txt")
    with open(list_path, "w") as f:
        f.write(scan + "\n")
    return list_path
