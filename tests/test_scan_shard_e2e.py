"""End-to-end --scan_shard: N real eval.py processes over a multi-scan
layout must together produce exactly what one unsharded run produces.

The logic-level slicing is covered by tests/test_eval_loaders.py; this
test guards the process/env integration (the class of bug fixed in
953d69c where `--distributed auto` misfired on single-worker hosts):
each shard process builds its own dataset, runs its own forward + fusion,
and must neither skip nor duplicate a scan.

Layout: two synthetic scans in the DTU-eval directory convention
(<scan>/pair.txt, images/, cams_1/ — data/dtu_eval.py). Scenes are
rendered at DTU's native 1600x1200 capture size so the loader's fixed
intrinsic rescale (dtu_eval.py full_w/full_h) stays geometrically exact;
the eval itself runs at a CPU-sized resolution via ITERMVS_IMG_WH.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.synthetic_scene import build_scene_dir

from itermvs_tpu.engine.checkpoint import pretrained_path

CKPT = pretrained_path("dtu")

pytestmark = pytest.mark.skipif(
    CKPT is None, reason="no vendored or reference checkpoint available")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_eval(testpath, testlist, outdir, shard=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["ITERMVS_IMG_WH"] = "320x256"
    cmd = [sys.executable, os.path.join(REPO, "eval.py"),
           "--dataset=dtu_yao_eval", "--batch_size=1", "--n_views", "4",
           f"--testpath={testpath}", f"--testlist={testlist}",
           "--geo_pixel_thres=1", "--geo_depth_thres=0.01",
           "--photo_thres=0.3", f"--outdir={outdir}",
           "--loadckpt", CKPT]
    if shard is not None:
        cmd.append(f"--scan_shard={shard}")
    result = subprocess.run(cmd, capture_output=True, text=True,
                            cwd=REPO, env=env, timeout=1800)
    assert result.returncode == 0, result.stderr[-3000:]
    return result


def _sorted_points(ply_path):
    from itermvs_tpu.io import read_ply

    xyz, _ = read_ply(ply_path)
    return xyz[np.lexsort(xyz.T)]


def test_scan_shard_processes_union_equals_unsharded(tmp_path):
    root = str(tmp_path / "data")
    # 6 views per scan: the DTU fusion path hardcodes geo_mask_thres=4
    # (reference parity), which needs ≥5 source views to be reachable.
    for scan, scene in (("scan1", "plane"), ("scan2", "sphere_step")):
        os.makedirs(os.path.join(root, scan))
        build_scene_dir(os.path.join(root, scan), num_views=6,
                        width=1600, height=1200, write_gt_depth=False,
                        scene=scene)
    testlist = str(tmp_path / "list.txt")
    with open(testlist, "w") as f:
        f.write("scan1\nscan2\n")

    out_full = str(tmp_path / "out_full")
    out_s0 = str(tmp_path / "out_s0")
    out_s1 = str(tmp_path / "out_s1")
    _run_eval(root, testlist, out_full)
    _run_eval(root, testlist, out_s0, shard="0/2")
    _run_eval(root, testlist, out_s1, shard="1/2")

    # Round-robin: shard 0 owns scan1, shard 1 owns scan2 — and ONLY
    # those (no duplicated work, no skipped scan).
    assert os.path.exists(os.path.join(out_s0, "itermvs001_l3.ply"))
    assert not os.path.exists(os.path.join(out_s0, "itermvs002_l3.ply"))
    assert not os.path.exists(os.path.join(out_s0, "scan2"))
    assert os.path.exists(os.path.join(out_s1, "itermvs002_l3.ply"))
    assert not os.path.exists(os.path.join(out_s1, "itermvs001_l3.ply"))
    assert not os.path.exists(os.path.join(out_s1, "scan1"))

    # Each shard's depth maps are byte-identical to the unsharded run's.
    for shard_out, scan in ((out_s0, "scan1"), (out_s1, "scan2")):
        for v in range(6):
            rel = os.path.join(scan, "depth_est", f"{v:08d}.pfm")
            with open(os.path.join(shard_out, rel), "rb") as a, \
                    open(os.path.join(out_full, rel), "rb") as b:
                assert a.read() == b.read(), rel

    # Fused clouds match as point sets (PLY write order may differ
    # across runs — the finalize tail is threaded).
    for shard_out, ply in ((out_s0, "itermvs001_l3.ply"),
                           (out_s1, "itermvs002_l3.ply")):
        a = _sorted_points(os.path.join(shard_out, ply))
        b = _sorted_points(os.path.join(out_full, ply))
        assert a.shape == b.shape, ply
        np.testing.assert_allclose(a, b, atol=1e-5)

    # Both scans actually fused to non-trivial clouds.
    assert _sorted_points(
        os.path.join(out_full, "itermvs001_l3.ply")).shape[0] > 10_000
    assert _sorted_points(
        os.path.join(out_full, "itermvs002_l3.ply")).shape[0] > 10_000
