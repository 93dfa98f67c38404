"""Measure the reference fusion loop's wall-clock on this host.

Re-times the reference's fusion algorithm (eval.py:154-309: per-(ref,src)
NumPy matmuls + cv2.remap bilinear depth sampling + reprojection checks,
sequential over pairs) on the same synthetic 7-view 1600×1152 scan
bench.py fuses, to calibrate BASELINE_FUSION_SEC_PER_SCENE. The math
here mirrors the reference's structure for a faithful cost model; the
shipped TPU fusion lives in itermvs_tpu/fusion.py and shares none of
this code path.

Usage: python -m tools.bench_reference_fusion
"""
from __future__ import annotations

import os
import sys
import tempfile
import shutil
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from itermvs_tpu.io import read_pfm, read_pair_file, read_camera_parameters
from tests.synthetic_scene import build_scene_dir


def _reproject(ref_depth, k_ref, e_ref, src_depth, k_src, e_src):
    h, w = ref_depth.shape
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    x, y = x.reshape(-1), y.reshape(-1)
    xyz_ref = np.linalg.inv(k_ref) @ (
        np.vstack([x, y, np.ones_like(x)]) * ref_depth.reshape(-1))
    xyz_src = (e_src @ np.linalg.inv(e_ref) @ np.vstack(
        [xyz_ref, np.ones_like(x)]))[:3]
    k_xyz_src = k_src @ xyz_src
    xy_src = k_xyz_src[:2] / k_xyz_src[2:3]

    x_src = xy_src[0].reshape(h, w).astype(np.float32)
    y_src = xy_src[1].reshape(h, w).astype(np.float32)
    sampled = cv2.remap(src_depth, x_src, y_src, interpolation=cv2.INTER_LINEAR)

    xyz_src2 = np.linalg.inv(k_src) @ (
        np.vstack([xy_src, np.ones_like(x)]) * sampled.reshape(-1))
    xyz_rep = (e_ref @ np.linalg.inv(e_src) @ np.vstack(
        [xyz_src2, np.ones_like(x)]))[:3]
    depth_rep = xyz_rep[2].reshape(h, w).astype(np.float32)
    k_xyz_rep = k_ref @ xyz_rep
    xy_rep = k_xyz_rep[:2] / (k_xyz_rep[2:3] + 1e-6)
    x_rep = xy_rep[0].reshape(h, w).astype(np.float32)
    y_rep = xy_rep[1].reshape(h, w).astype(np.float32)
    return depth_rep, x_rep, y_rep


def _check(ref_depth, k_ref, e_ref, src_depth, k_src, e_src, pix_th, dep_th):
    h, w = ref_depth.shape
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    depth_rep, x_rep, y_rep = _reproject(
        ref_depth, k_ref, e_ref, src_depth, k_src, e_src)
    dist = np.sqrt((x_rep - x) ** 2 + (y_rep - y) ** 2)
    depth_diff = np.abs(depth_rep - ref_depth)
    relative = depth_diff / ref_depth
    mask = np.logical_and(dist < pix_th, relative < dep_th)
    depth_rep[~mask] = 0
    return mask, depth_rep


def fuse_scan(root, img_wh, plyfilename):
    """Full reference fusion flow incl. mask PNGs, vertex back-projection
    and PLY output (eval.py:223-309) — apples-to-apples with
    itermvs_tpu.fusion.filter_depth's timing."""
    from PIL import Image

    from itermvs_tpu.io.ply import PlyWriter

    pair_data = read_pair_file(os.path.join(root, "pair.txt"))
    os.makedirs(os.path.join(root, "refmask"), exist_ok=True)
    ply = PlyWriter(plyfilename)
    for ref_view, src_views in pair_data:
        k_ref, e_ref = read_camera_parameters(
            os.path.join(root, f"cams_1/{ref_view:0>8}_cam.txt"))
        ref_depth = read_pfm(
            os.path.join(root, f"depth_est/{ref_view:0>8}.pfm"))[0][..., 0]
        conf = read_pfm(
            os.path.join(root, f"confidence/{ref_view:0>8}.pfm"))[0][..., 0]
        img = cv2.cvtColor(cv2.imread(
            os.path.join(root, f"images/{ref_view:0>8}.jpg")), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img.astype(np.float32) / 255.0, img_wh,
                         interpolation=cv2.INTER_LINEAR)
        photo_mask = conf > 0.3
        geo_sum = 0
        reproj = []
        for sv in src_views:
            k_src, e_src = read_camera_parameters(
                os.path.join(root, f"cams_1/{sv:0>8}_cam.txt"))
            src_depth = read_pfm(
                os.path.join(root, f"depth_est/{sv:0>8}.pfm"))[0][..., 0]
            mask, depth_rep = _check(ref_depth, k_ref, e_ref,
                                     src_depth, k_src, e_src, 1.0, 0.01)
            geo_sum = geo_sum + mask.astype(np.int32)
            reproj.append(depth_rep)
        avg = (sum(reproj) + ref_depth) / (geo_sum + 1)
        geo_mask = geo_sum >= 3
        final = photo_mask & geo_mask
        for tag, m in (("photo", photo_mask), ("geo", geo_mask),
                       ("final", final)):
            Image.fromarray(m.astype(np.uint8) * 255).save(
                os.path.join(root, f"refmask/{ref_view:0>8}_{tag}.png"))
        h, w = avg.shape
        gx, gy = np.meshgrid(np.arange(w), np.arange(h))
        x, y, depth = gx[final], gy[final], avg[final]
        xyz_ref = np.linalg.inv(k_ref) @ (
            np.vstack([x, y, np.ones_like(x)]) * depth)
        xyz_world = (np.linalg.inv(e_ref) @ np.vstack(
            [xyz_ref, np.ones_like(x)]))[:3]
        ply.add(xyz_world.T.astype(np.float32),
                (img[final] * 255).astype(np.uint8))
    return ply.close()


def main():
    width, height, views = 1600, 1152, 7
    root = tempfile.mkdtemp(prefix="ref_fusion_bench_")
    try:
        build_scene_dir(root, num_views=views, width=width, height=height)
        start = time.time()
        n = fuse_scan(root, (width, height), os.path.join(root, "ref.ply"))
        elapsed = time.time() - start
        print(f"reference-style fusion: {elapsed:.2f} s/scene "
              f"({views} ref views x {views - 1} srcs, {n} pts)")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
