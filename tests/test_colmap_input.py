"""tools/colmap_input.py: COLMAP sparse text model → MVS input layout.

Builds a tiny synthetic COLMAP reconstruction (plane scene cameras +
3D points on z = Z0 with per-view tracks), runs the converter CLI, and
validates the outputs end to end: cam files parse back to the exact
K/E, depth ranges bracket the plane, pair.txt is well-formed and
highest-scored-first, and the converted directory loads through the
`custom` dataset loader.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.synthetic_scene import make_cameras, Z0


def _write_colmap_text(root, cams, width, height, n_points=120):
    from scipy.spatial.transform import Rotation

    sparse = os.path.join(root, "sparse")
    images = os.path.join(root, "images")
    os.makedirs(sparse)
    os.makedirs(images)

    with open(os.path.join(sparse, "cameras.txt"), "w") as f:
        f.write("# cameras\n")
        for cid, (K, _) in enumerate(cams, start=1):
            f.write(f"{cid} PINHOLE {width} {height} "
                    f"{K[0,0]} {K[1,1]} {K[0,2]} {K[1,2]}\n")

    # 3D points on the plane, visible in every view.
    rng = np.random.RandomState(3)
    pts = np.stack([rng.uniform(-1.5, 1.5, n_points),
                    rng.uniform(-1.0, 1.0, n_points),
                    np.full(n_points, Z0)], axis=1)
    with open(os.path.join(sparse, "points3D.txt"), "w") as f:
        f.write("# points\n")
        for pid, p in enumerate(pts, start=1):
            track = " ".join(f"{v + 1} {pid - 1}" for v in range(len(cams)))
            f.write(f"{pid} {p[0]} {p[1]} {p[2]} 128 128 128 0.5 {track}\n")

    from PIL import Image

    with open(os.path.join(sparse, "images.txt"), "w") as f:
        f.write("# images\n")
        for iid, (K, E) in enumerate(cams, start=1):
            q = Rotation.from_matrix(E[:3, :3]).as_quat()  # (x, y, z, w)
            t = E[:3, 3]
            name = f"view_{iid}.jpg"
            f.write(f"{iid} {q[3]} {q[0]} {q[1]} {q[2]} "
                    f"{t[0]} {t[1]} {t[2]} {iid} {name}\n")
            f.write(" ".join(f"{p[0]} {p[1]} {pid}"
                             for pid, p in enumerate(pts[:, :2], start=1))
                    + "\n")
            Image.fromarray(np.full((height, width, 3), 90, np.uint8)).save(
                os.path.join(images, name))


def test_colmap_converter_end_to_end(tmp_path):
    pytest.importorskip("scipy")
    width, height, views = 64, 48, 4
    cams = make_cameras(views, width, height, np.random.RandomState(0))
    root = str(tmp_path / "proj")
    os.makedirs(root)
    _write_colmap_text(root, cams, width, height)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    result = subprocess.run(
        [sys.executable, "-m", "tools.colmap_input",
         f"--input_folder={root}", "--num_src_images", "3"],
        capture_output=True, text=True, cwd=repo, timeout=300)
    assert result.returncode == 0, result.stderr[-2000:]

    from itermvs_tpu.io import read_camera_parameters, read_pair_file

    for i, (K, E) in enumerate(cams):
        intr, extr = read_camera_parameters(
            os.path.join(root, f"cams_1/{i:08d}_cam.txt"))
        np.testing.assert_allclose(intr, K, rtol=1e-5)
        np.testing.assert_allclose(extr, E, rtol=1e-4, atol=1e-6)
        # Depth range (1%/99% of visible point depths) brackets the plane.
        with open(os.path.join(root, f"cams_1/{i:08d}_cam.txt")) as f:
            dmin, dmax = map(float, f.read().splitlines()[-1].split())
        assert 0.5 * Z0 < dmin <= dmax < 2.0 * Z0

    pairs = read_pair_file(os.path.join(root, "pair.txt"))
    assert len(pairs) == views
    for ref, srcs in pairs:
        assert len(srcs) == 3
        assert ref not in srcs or srcs[0] != ref  # best source first
        assert all(0 <= s < views for s in srcs)
        assert os.path.exists(os.path.join(root, f"images/{ref:08d}.jpg"))

    # The converted layout loads through the custom dataset.
    from itermvs_tpu.data import find_dataset_def

    ds = find_dataset_def("custom")(root, n_views=3, img_wh=(64, 48))
    sample = ds[0]
    assert sample["imgs"]["level_0"].shape == (3, 48, 64, 3)
    assert np.isfinite(sample["depth_min"]) and np.isfinite(sample["depth_max"])
