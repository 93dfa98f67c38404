"""DTU scorer tests on synthetic clouds with known distances."""
import json
import subprocess
import sys

import numpy as np

from itermvs_tpu.benchmark.dtu_score import (
    aggregate, nn_distances, reduce_points, score)
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


def test_aggregate_matches_computestat_protocol():
    """mean over scans of per-scan mean acc/comp; overall = their average
    (ComputeStat_web.m:79-83)."""
    per_scan = [
        {"accuracy_mm": 0.3, "completeness_mm": 0.5},
        {"accuracy_mm": 0.5, "completeness_mm": 0.3},
        {"accuracy_mm": 0.4, "completeness_mm": 0.4},
    ]
    agg = aggregate(per_scan)
    assert agg["n_scans"] == 3
    assert agg["mean_accuracy_mm"] == np.mean([0.3, 0.5, 0.4])
    assert agg["mean_completeness_mm"] == np.mean([0.5, 0.3, 0.4])
    np.testing.assert_allclose(agg["overall_mm"], 0.4, rtol=1e-12)
    assert agg["median_accuracy_mm"] == 0.4


def test_scan_list_cli_aggregates(tmp_path, rng):
    """The --scan_list CLI scores each line and prints the aggregate as
    its final JSON line."""
    rgb = None
    lines = []
    for i, off in enumerate((0.2, 0.4)):
        gt = (rng.rand(4000, 3) * 50).astype(np.float32)
        data = gt + np.array([off, 0, 0], np.float32)
        rgb = np.zeros_like(gt, dtype=np.uint8)
        gt_ply = str(tmp_path / f"gt{i}.ply")
        data_ply = str(tmp_path / f"data{i}.ply")
        write_ply(gt_ply, gt, rgb)
        write_ply(data_ply, data, rgb)
        lines.append(f"{data_ply} {gt_ply}")
    scan_list = tmp_path / "scans.txt"
    scan_list.write_text("\n".join(lines) + "\n")

    out = subprocess.run(
        [sys.executable, "-m", "itermvs_tpu.benchmark.dtu_score",
         "--scan_list", str(scan_list)],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    agg = json.loads(out.stdout.strip().splitlines()[-1])
    assert agg["n_scans"] == 2
    assert 0.0 < agg["overall_mm"] <= 0.3 + 1e-6
    assert len(agg["per_scan"]) == 2
    assert agg["per_scan"][0]["accuracy_mm"] <= 0.2 + 1e-6
