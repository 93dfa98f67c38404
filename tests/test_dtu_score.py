"""DTU scorer tests on synthetic clouds with known distances."""
import numpy as np

from itermvs_tpu.benchmark.dtu_score import reduce_points, nn_distances, score
from itermvs_tpu.io import write_ply


def test_reduce_points_density(rng):
    pts = rng.rand(20000, 3).astype(np.float64) * 10
    red = reduce_points(pts, dst=1.0)
    # ≤ one point per unit voxel over a 10³ volume (some voxels empty).
    assert red.shape[0] <= 11 ** 3
    assert red.shape[0] > 500


def test_nn_distances_exact(rng):
    gt = rng.rand(1000, 3) * 10
    offset = np.array([0.05, 0.0, 0.0])
    d = nn_distances(gt + offset, gt)
    assert d.max() <= 0.05 + 1e-9


def test_score_known_offset(tmp_path, rng):
    gt = (rng.rand(20000, 3) * 100).astype(np.float32)
    data = gt + np.array([0.3, 0, 0], np.float32)
    rgb = np.zeros_like(gt, dtype=np.uint8)
    gt_ply = str(tmp_path / "gt.ply")
    data_ply = str(tmp_path / "data.ply")
    write_ply(gt_ply, gt, rgb)
    write_ply(data_ply, data, rgb)
    result = score(data_ply, gt_ply, density=0.2)
    # Every point displaced 0.3 → acc ≈ comp ≈ ≤0.3 (NN may find closer).
    assert result["accuracy_mm"] <= 0.3 + 1e-6
    assert result["completeness_mm"] <= 0.3 + 1e-6
    assert result["overall_mm"] > 0.05
