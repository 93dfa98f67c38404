"""End-to-end: eval.py CLI on a synthetic scene → depth PFMs → fused PLY.

Exercises every layer (loader → jitted model → PFM seam → fusion → PLY)
with the released DTU checkpoint; validates reconstruction geometry
against the scene's known plane.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.synthetic_scene import build_scene_dir, Z0

from itermvs_tpu.engine.checkpoint import pretrained_path

CKPT = pretrained_path("dtu")

pytestmark = pytest.mark.skipif(
    CKPT is None, reason="no vendored or reference checkpoint available")


def test_eval_cli_end_to_end(tmp_path):
    scene = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    os.makedirs(scene)
    build_scene_dir(scene, num_views=4, width=512, height=384,
                    write_gt_depth=False)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    result = subprocess.run(
        [sys.executable, os.path.join(repo, "eval.py"),
         "--dataset=custom", "--batch_size=1", "--n_views", "4",
         "--img_wh", "512", "384", f"--testpath={scene}",
         "--geo_pixel_thres=1", "--geo_depth_thres=0.01", "--photo_thres=0.3",
         f"--outdir={out}", "--loadckpt", CKPT],
        capture_output=True, text=True, cwd=repo, env=env, timeout=1200)
    assert result.returncode == 0, result.stderr[-3000:]

    from itermvs_tpu.io import read_pfm, read_ply

    depth, _ = read_pfm(os.path.join(out, "depth_est/00000000.pfm"))
    conf, _ = read_pfm(os.path.join(out, "confidence/00000000.pfm"))
    assert depth.shape == (384, 512, 1)
    assert conf.shape == (384, 512, 1)
    assert np.isfinite(depth).all()

    ply = os.path.join(out, "custom.ply")
    assert os.path.exists(ply)
    xyz, rgb = read_ply(ply)
    assert xyz.shape[0] > 50_000, "fusion produced too few points"
    # Fused points concentrate on the synthetic plane z = Z0.
    median_err = np.median(np.abs(xyz[:, 2] - Z0))
    assert median_err < 0.05, f"median plane error {median_err}"

    # Chain the DTU scorer (benchmark protocol: 0.2-unit density
    # downsample, NN acc/comp, outlier cutoff) against an analytic GT
    # sampling of the plane over the reconstruction's footprint.
    from itermvs_tpu.benchmark.dtu_score import score
    from itermvs_tpu.io import write_ply

    lo = np.percentile(xyz[:, :2], 2, axis=0)
    hi = np.percentile(xyz[:, :2], 98, axis=0)
    gx, gy = np.meshgrid(np.arange(lo[0], hi[0], 0.02),
                         np.arange(lo[1], hi[1], 0.02))
    gt = np.stack([gx.ravel(), gy.ravel(),
                   np.full(gx.size, Z0)], axis=1).astype(np.float32)
    gt_ply = os.path.join(out, "gt_plane.ply")
    write_ply(gt_ply, gt, np.zeros_like(gt, dtype=np.uint8))
    result = score(ply, gt_ply, density=0.02, max_dist=1.0)
    assert result["accuracy_mm"] < 0.06, result
    assert result["completeness_mm"] < 0.1, result
    assert result["overall_mm"] < 0.08, result


def test_eval_cli_sphere_step_scene(tmp_path):
    """Full eval.py → fusion → scorer chain on the discontinuous scene
    (sphere + stepped plane, real occlusion between views) — the
    geometry class where mm-level regressions hide that the planar
    fixture cannot catch."""
    from tests.synthetic_scene import gt_point_cloud

    scene = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    os.makedirs(scene)
    cams, depths = build_scene_dir(scene, num_views=5, width=448, height=320,
                                   write_gt_depth=False, scene="sphere_step")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    result = subprocess.run(
        [sys.executable, os.path.join(repo, "eval.py"),
         "--dataset=custom", "--batch_size=1", "--n_views", "5",
         "--img_wh", "448", "320", f"--testpath={scene}",
         "--geo_pixel_thres=1", "--geo_depth_thres=0.01", "--photo_thres=0.3",
         f"--outdir={out}", "--loadckpt", CKPT],
        capture_output=True, text=True, cwd=repo, env=env, timeout=1800)
    assert result.returncode == 0, result.stderr[-3000:]

    from itermvs_tpu.io import read_ply, write_ply
    from itermvs_tpu.benchmark.dtu_score import score

    ply = os.path.join(out, "custom.ply")
    xyz, _ = read_ply(ply)
    assert xyz.shape[0] > 30_000, "fusion produced too few points"

    gt = gt_point_cloud(cams, depths, stride=1)
    gt_ply = os.path.join(out, "gt_sphere.ply")
    write_ply(gt_ply, gt, np.zeros_like(gt, dtype=np.uint8))
    r = score(ply, gt_ply, density=0.02, max_dist=1.0)
    # Trained-model depths on non-trivial geometry: accuracy holds to a
    # few hundredths of a world unit (1 unit ≈ sphere radius ≈ 0.9);
    # completeness is looser — occlusion boundaries get culled.
    assert r["accuracy_mm"] < 0.06, r
    assert r["completeness_mm"] < 0.15, r

    # Points must exist BOTH near the sphere and on the far (stepped)
    # plane — i.e. the reconstruction covers the discontinuity.
    from tests.synthetic_scene import SPHERE_CENTER, SPHERE_RADIUS, STEP_DZ
    d_sph = np.linalg.norm(xyz - SPHERE_CENTER[None, :], axis=1)
    on_sphere = np.abs(d_sph - SPHERE_RADIUS) < 0.05
    on_far = np.abs(xyz[:, 2] - (Z0 + STEP_DZ)) < 0.05
    assert on_sphere.mean() > 0.02, f"sphere coverage {on_sphere.mean():.3%}"
    assert on_far.mean() > 0.02, f"far-plane coverage {on_far.mean():.3%}"
