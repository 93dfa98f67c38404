"""The shipped eval_dtu.sh must run on a fresh clone: default CKPT_FILE
resolves to the vendored .npz weights (no reference mount, no torch
pickle), and the script reaches depth inference + fusion end-to-end on
a synthetic DTU-eval layout (reference behavior: committed checkpoint +
eval_dtu.sh:9-11).

The scene is rendered at DTU's native 1600x1200 capture size so the
loader's fixed intrinsic rescale stays geometrically exact; the eval
itself runs at a CPU-sized resolution via ITERMVS_IMG_WH (the script
passes extra args through, so --testlist overrides the shipped DTU
list — argparse keeps the last occurrence).
"""
import os
import subprocess

import numpy as np
import pytest

from tests.synthetic_scene import build_scene_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VENDORED = os.path.join(REPO, "checkpoints", "dtu", "model_000015.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VENDORED), reason="vendored weights not present")


def test_eval_dtu_script_runs_from_clean_checkout(tmp_path):
    root = str(tmp_path / "data")
    # 6 views: the DTU fusion path hardcodes geo_mask_thres=4
    # (reference parity), which needs >=5 source views to be reachable.
    os.makedirs(os.path.join(root, "scan1"))
    build_scene_dir(os.path.join(root, "scan1"), num_views=6,
                    width=1600, height=1200, write_gt_depth=False)
    testlist = str(tmp_path / "list.txt")
    with open(testlist, "w") as f:
        f.write("scan1\n")
    outdir = str(tmp_path / "out")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["ITERMVS_IMG_WH"] = "320x256"
    env["DTU_TESTING"] = root
    env["OUT_DIR"] = outdir
    env.pop("CKPT_FILE", None)            # the default must be used
    result = subprocess.run(
        ["bash", os.path.join(REPO, "eval_dtu.sh"),
         "--testlist", testlist, "--n_views", "4"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=1800)
    assert result.returncode == 0, (result.stdout[-2000:]
                                    + result.stderr[-3000:])

    ply = os.path.join(outdir, "itermvs001_l3.ply")
    assert os.path.exists(ply), os.listdir(outdir)
    from itermvs_tpu.io import read_ply
    from tests.synthetic_scene import Z0

    xyz, _ = read_ply(ply)
    assert xyz.shape[0] > 20000
    assert np.median(np.abs(xyz[:, 2] - Z0)) < 0.05
