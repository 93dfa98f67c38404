"""Data-parallel eval: eval.py CLI sharded over an 8-device CPU mesh.

Exercises the mesh-sharded inference path including final-batch padding
(4 scene views into a batch of 8) and the PFM/PLY output seam.
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


def test_eval_cli_sharded_8dev(tmp_path):
    scene = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    os.makedirs(scene)
    build_scene_dir(scene, num_views=4, width=128, height=96,
                    write_gt_depth=False)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    result = subprocess.run(
        [sys.executable, os.path.join(repo, "eval.py"),
         "--dataset=custom", "--batch_size=8", "--n_views", "4",
         "--img_wh", "128", "96", f"--testpath={scene}",
         # float32 wire keeps the unquantized fetch branch e2e-covered
         # (the default uint16 wire is exercised by test_e2e_eval and
         # test_scan_shard_e2e).
         "--result_wire", "float32",
         f"--outdir={out}", "--loadckpt", CKPT],
        capture_output=True, text=True, cwd=repo, env=env, timeout=1200)
    assert result.returncode == 0, result.stderr[-3000:]
    assert "data-parallel eval over 8 devices" in result.stdout

    from itermvs_tpu.io import read_pfm

    for v in range(4):
        depth, _ = read_pfm(os.path.join(out, f"depth_est/0000000{v}.pfm"))
        assert depth.shape == (96, 128, 1)
        assert np.isfinite(depth).all()
    assert os.path.exists(os.path.join(out, "custom.ply"))
