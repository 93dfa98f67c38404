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


# ---------------------------------------------------------------------------
# Brute-force cross-validation of the full MATLAB protocol
# (BaseEvalMain_web.m:63-69,99-100 / reducePts_haa.m / ComputeStat_web.m:79-83)
# on a fixture where every branch — voxel downsample, ObsMask filter,
# Plane filter, the 20 mm outlier cutoff — is independently recomputable
# with O(N²) NumPy. Points are spaced wider than the downsample voxel so
# reduce_points is a set-identity and the comparison is exact.
# ---------------------------------------------------------------------------

def _brute_nn(src, dst):
    """O(N²) nearest-neighbor distances, independent of scipy/cKDTree."""
    d2 = (np.sum(src * src, axis=1)[:, None]
          + np.sum(dst * dst, axis=1)[None, :]
          - 2.0 * (src @ dst.T))
    return np.sqrt(np.maximum(d2.min(axis=1), 0.0))


def _protocol_fixture(tmp_path, rng):
    """GT grid + data cloud with known offsets, outliers, points outside
    the ObsMask, and GT points below the evaluation plane."""
    from scipy.io import savemat

    # GT: 40×40 grid, 1 mm pitch, z = 10 + small slope (spacing 1 mm
    # >> density 0.2 mm → downsample keeps every point).
    gx, gy = np.meshgrid(np.arange(40.0), np.arange(40.0))
    gt = np.stack([gx.ravel(), gy.ravel(),
                   10.0 + 0.01 * gx.ravel()], axis=1)
    # Half the GT sits below the plane z = 10.2 → excluded from
    # completeness by the Plane filter.
    plane = np.array([0.0, 0.0, 1.0, -10.2])

    # Data: GT + per-point jitter ≤ 0.05 mm, plus
    #  - 30 outlier points displaced 25 mm (> MAX_DIST → dropped),
    #  - 40 points far outside the ObsMask bounding box (→ masked out).
    jitter = (rng.rand(*gt.shape) - 0.5) * 0.1
    data = gt + jitter
    outliers = gt[:30] + np.array([0.0, 0.0, 25.0])
    unobserved = gt[100:140] + np.array([500.0, 0.0, 0.0])
    data_all = np.concatenate([data, outliers, unobserved], axis=0)

    # ObsMask covers the grid volume plus the outliers, not `unobserved`.
    bb = np.array([[-2.0, -2.0, 5.0], [45.0, 45.0, 40.0]])
    res = 1.0
    shape = np.ceil((bb[1] - bb[0]) / res).astype(int)
    obs = np.ones(shape, np.uint8)
    savemat(tmp_path / "ObsMask1_10.mat",
            {"BB": bb, "Res": res, "ObsMask": obs})
    savemat(tmp_path / "Plane1.mat", {"P": plane.reshape(4, 1)})

    from itermvs_tpu.io import write_ply
    gt_ply = str(tmp_path / "gt.ply")
    data_ply = str(tmp_path / "data.ply")
    write_ply(gt_ply, gt.astype(np.float32),
              np.zeros_like(gt, dtype=np.uint8))
    write_ply(data_ply, data_all.astype(np.float32),
              np.zeros_like(data_all, dtype=np.uint8))
    # Round-trip through the float32 PLY is part of what score() sees.
    gt32 = gt.astype(np.float32).astype(np.float64)
    data32 = data_all.astype(np.float32).astype(np.float64)
    return gt_ply, data_ply, gt32, data32, plane, bb, res, obs


def test_score_matches_bruteforce_protocol(tmp_path, rng):
    gt_ply, data_ply, gt, data_all, plane, bb, res, obs = (
        _protocol_fixture(tmp_path, rng))

    result = score(data_ply, gt_ply,
                   obs_mask_path=str(tmp_path / "ObsMask1_10.mat"),
                   plane_path=str(tmp_path / "Plane1.mat"))

    # Independent protocol replay.
    # 1. Downsample is identity here (1 mm spacing vs 0.2 mm voxels).
    assert result["n_data_points"] > 0
    # 2. ObsMask: voxelize against BB/Res, drop unobservable points.
    idx = np.floor((data_all - bb[0]) / res).astype(int)
    inside = np.all((idx >= 0) & (idx < np.asarray(obs.shape)), axis=1)
    keep = np.zeros(len(data_all), bool)
    keep[inside] = obs[idx[inside, 0], idx[inside, 1], idx[inside, 2]] > 0
    data_eval = data_all[keep]
    assert result["n_data_points"] == data_eval.shape[0]
    # The 40 unobserved points (and only those) must be masked out.
    assert data_eval.shape[0] == len(data_all) - 40

    # 3. Accuracy: data→GT NN distance, outliers ≥ 20 mm dropped.
    d_acc = _brute_nn(data_eval, gt)
    assert (d_acc > 20.0).sum() == 30          # exactly the outliers
    d_acc = d_acc[d_acc < 20.0]
    np.testing.assert_allclose(result["accuracy_mm"], d_acc.mean(),
                               rtol=1e-9)
    np.testing.assert_allclose(result["acc_median_mm"], np.median(d_acc),
                               rtol=1e-9)

    # 4. Completeness: GT above plane → full downsampled data cloud.
    above = gt @ plane[:3] + plane[3] > 0
    assert 0 < above.sum() < len(gt)           # the plane filter bites
    assert result["n_gt_points"] == above.sum()
    d_comp = _brute_nn(gt[above], data_all)
    d_comp = d_comp[d_comp < 20.0]
    np.testing.assert_allclose(result["completeness_mm"], d_comp.mean(),
                               rtol=1e-9)

    # 5. Overall = (acc + comp) / 2 (BaseEvalMain_web.m:99-100).
    np.testing.assert_allclose(
        result["overall_mm"],
        (result["accuracy_mm"] + result["completeness_mm"]) / 2.0,
        rtol=1e-12)


def test_score_query_cap_is_unbiased_here(tmp_path, rng):
    """query_cap larger than the cloud is an exact no-op; a smaller cap
    still lands near the exact mean on this benign fixture."""
    gt_ply, data_ply, *_ = _protocol_fixture(tmp_path, rng)
    exact = score(data_ply, gt_ply,
                  obs_mask_path=str(tmp_path / "ObsMask1_10.mat"),
                  plane_path=str(tmp_path / "Plane1.mat"))
    capped = score(data_ply, gt_ply,
                   obs_mask_path=str(tmp_path / "ObsMask1_10.mat"),
                   plane_path=str(tmp_path / "Plane1.mat"),
                   query_cap=10 ** 9)
    np.testing.assert_allclose(capped["overall_mm"], exact["overall_mm"],
                               rtol=1e-12)
    sub = score(data_ply, gt_ply,
                obs_mask_path=str(tmp_path / "ObsMask1_10.mat"),
                plane_path=str(tmp_path / "Plane1.mat"),
                query_cap=800)
    np.testing.assert_allclose(sub["overall_mm"], exact["overall_mm"],
                               atol=0.02)


def test_reduce_points_is_identity_when_sparse(rng):
    """Points spaced wider than the voxel must all survive (the fixture
    assumption above, asserted directly)."""
    pts = np.stack(np.meshgrid(np.arange(10.0), np.arange(10.0),
                               np.arange(3.0)), axis=-1).reshape(-1, 3)
    red = reduce_points(pts, dst=0.2)
    assert red.shape[0] == pts.shape[0]
    assert {tuple(p) for p in red} == {tuple(p) for p in pts}
