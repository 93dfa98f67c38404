"""DTU accuracy/completeness scorer — Python port of the MATLAB protocol.

Replaces the reference's evaluations/dtu/*.m pipeline
(BaseEvalMain_web.m / PointCompareMain.m / MaxDistCP.m / reducePts_haa.m):

  1. downsample the fused cloud to ~0.2 mm density (voxel-hash variant
     of reducePts_haa.m:1-35);
  2. accuracy  = mean point→GT-STL nearest-neighbor distance over data
     points (within the observability mask when ObsMask*.mat is given),
     outliers > 20 mm dropped (BaseEvalMain_web.m:63-69);
  3. completeness = mean GT→data distance over STL points (above the
     ground plane when Plane*.mat is given), same outlier cutoff;
  4. overall = (acc + comp) / 2 (BaseEvalMain_web.m:99-100).

NN queries use scipy cKDTree in chunks (the MATLAB code chunks KD-trees
the same way, MaxDistCP.m:1-50).

CLI (single scan):
    python -m itermvs_tpu.benchmark.dtu_score \
        --data outputs/itermvs001_l3.ply --gt Points/stl/stl001_total.ply \
        [--obs_mask ObsMask1_10.mat] [--plane Plane1.mat]

CLI (multi-scan aggregation, the ComputeStat_web.m equivalent):
    python -m itermvs_tpu.benchmark.dtu_score --scan_list scans.txt
where each non-empty line of scans.txt is
    <data.ply> <gt.ply> [<ObsMask.mat> [<Plane.mat>]]
or, with the DTU SampleSet layout,
    python -m itermvs_tpu.benchmark.dtu_score \
        --data_dir outputs --gt_dir SampleSet/MVS_Data \
        --scans 1 4 9 10 ... [--method itermvs]
Aggregation protocol (ComputeStat_web.m:44-83): per scan, the mean and
median of the outlier-filtered distances (exactly what `score` returns);
the headline numbers are the plain means over scans of per-scan mean
accuracy / completeness, overall = their average (the published DTU
table convention, reference README.md:89-93).
"""
from __future__ import annotations

import argparse
import json

import numpy as np

MAX_DIST = 20.0    # outlier cutoff, mm
DENSITY = 0.2      # downsample grid, mm


def reduce_points(pts: np.ndarray, dst: float = DENSITY, seed: int = 0) -> np.ndarray:
    """Voxel-hash downsample: ≤1 point per dst-sized voxel (random pick)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(pts.shape[0])
    pts = pts[order]
    keys = np.floor(pts / dst).astype(np.int64)
    # Unique voxel → first (random because permuted) point.
    _, idx = np.unique(keys, axis=0, return_index=True)
    return pts[idx]


def nn_distances(src: np.ndarray, dst: np.ndarray, chunk: int = 200_000) -> np.ndarray:
    """Nearest-neighbor distance from each src point to the dst cloud."""
    from scipy.spatial import cKDTree

    tree = cKDTree(dst)
    out = np.empty(src.shape[0], np.float64)
    for start in range(0, src.shape[0], chunk):
        d, _ = tree.query(src[start:start + chunk], k=1, workers=-1)
        out[start:start + chunk] = d
    return out


def load_obs_mask(path: str):
    """ObsMask{scan}_10.mat → (BB [2,3], Res scalar, ObsMask 3D bool)."""
    from scipy.io import loadmat

    m = loadmat(path)
    return m["BB"].astype(np.float64), float(np.squeeze(m["Res"])), m["ObsMask"]


def load_plane(path: str) -> np.ndarray:
    from scipy.io import loadmat

    return np.squeeze(loadmat(path)["P"]).astype(np.float64)


def apply_obs_mask(pts: np.ndarray, bb: np.ndarray, res: float,
                   obs_mask: np.ndarray) -> np.ndarray:
    """Keep points whose voxel (after BB/Res transform) is observable."""
    idx = np.floor((pts - bb[0:1]) / res).astype(np.int64)
    shape = np.asarray(obs_mask.shape)
    inside = np.all((idx >= 0) & (idx < shape), axis=1)
    keep = np.zeros(pts.shape[0], bool)
    ii = idx[inside]
    keep[inside] = obs_mask[ii[:, 0], ii[:, 1], ii[:, 2]] > 0
    return keep


def _subsample(pts: np.ndarray, cap: int | None, seed: int = 1) -> np.ndarray:
    """Uniform random subsample to ≤cap rows (fixed seed, no-op if under)."""
    if cap is None or pts.shape[0] <= cap:
        return pts
    rng = np.random.default_rng(seed)
    return pts[rng.choice(pts.shape[0], cap, replace=False)]


def score(data_ply: str, gt_ply: str, obs_mask_path: str | None = None,
          plane_path: str | None = None, density: float = DENSITY,
          max_dist: float = MAX_DIST, query_cap: int | None = None) -> dict:
    """Score one scan. `query_cap` bounds KD-tree QUERY counts only: the
    per-point NN distances whose means are acc/comp are estimated from a
    uniform random sample of the query cloud (an unbiased estimator of
    the same mean), while tree TARGETS always keep every point — thinning
    a target would inflate distances, a bias. Protocol semantics
    (reducePts density, ObsMask/Plane filters, 20 mm cutoff) unchanged."""
    from itermvs_tpu.io import read_ply

    data_pts, _ = read_ply(data_ply)
    gt_pts, _ = read_ply(gt_ply)
    data_pts = reduce_points(data_pts.astype(np.float64), density)

    # Accuracy: data → GT.
    if obs_mask_path:
        bb, res, obs = load_obs_mask(obs_mask_path)
        keep = apply_obs_mask(data_pts, bb, res, obs)
        data_eval = data_pts[keep]
    else:
        data_eval = data_pts
    d_acc = nn_distances(_subsample(data_eval, query_cap),
                         gt_pts.astype(np.float64))
    d_acc = d_acc[d_acc < max_dist]

    # Completeness: GT → data.
    if plane_path:
        plane = load_plane(plane_path)
        above = (np.concatenate([gt_pts, np.ones((gt_pts.shape[0], 1),
                                                 gt_pts.dtype)], axis=1)
                 @ plane) > 0
        gt_eval = gt_pts[above]
    else:
        gt_eval = gt_pts
    d_comp = nn_distances(_subsample(gt_eval.astype(np.float64), query_cap),
                          data_pts)
    d_comp = d_comp[d_comp < max_dist]

    acc = float(np.mean(d_acc)) if d_acc.size else float("nan")
    comp = float(np.mean(d_comp)) if d_comp.size else float("nan")
    return {
        "accuracy_mm": acc,
        "completeness_mm": comp,
        "overall_mm": (acc + comp) / 2.0,
        "acc_median_mm": float(np.median(d_acc)) if d_acc.size else float("nan"),
        "comp_median_mm": float(np.median(d_comp)) if d_comp.size else float("nan"),
        "n_data_points": int(data_eval.shape[0]),
        "n_gt_points": int(gt_eval.shape[0]),
    }


def aggregate(per_scan: list[dict]) -> dict:
    """Multi-scan statistics over `score()` results (ComputeStat_web.m).

    The published DTU table numbers are mean-over-scans of the per-scan
    mean accuracy / completeness (ComputeStat_web.m:79-83); medians of
    the per-scan means are reported alongside, as the leaderboards do.
    """
    acc = np.asarray([r["accuracy_mm"] for r in per_scan], np.float64)
    comp = np.asarray([r["completeness_mm"] for r in per_scan], np.float64)
    return {
        "n_scans": len(per_scan),
        "mean_accuracy_mm": float(np.mean(acc)),
        "mean_completeness_mm": float(np.mean(comp)),
        "overall_mm": float((np.mean(acc) + np.mean(comp)) / 2.0),
        "median_accuracy_mm": float(np.median(acc)),
        "median_completeness_mm": float(np.median(comp)),
        "per_scan": per_scan,
    }


def _scan_jobs(args) -> list[tuple]:
    """(data, gt, obs_mask, plane, label) jobs from --scan_list or
    the DTU SampleSet directory convention."""
    jobs = []
    if args.scan_list:
        with open(args.scan_list) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                data, gt = parts[0], parts[1]
                obs = parts[2] if len(parts) > 2 else None
                plane = parts[3] if len(parts) > 3 else None
                jobs.append((data, gt, obs, plane, data))
        return jobs
    import os
    for scan in args.scans:
        data = os.path.join(args.data_dir,
                            f"{args.method}{scan:03d}_l3.ply")
        gt = os.path.join(args.gt_dir, "Points", "stl",
                          f"stl{scan:03d}_total.ply")
        obs = os.path.join(args.gt_dir, "ObsMask", f"ObsMask{scan}_10.mat")
        plane = os.path.join(args.gt_dir, "ObsMask", f"Plane{scan}.mat")
        jobs.append((data, gt,
                     obs if os.path.exists(obs) else None,
                     plane if os.path.exists(plane) else None,
                     f"scan{scan}"))
    return jobs


def main():
    parser = argparse.ArgumentParser(description="DTU acc/comp scorer")
    parser.add_argument("--data", help="fused point cloud .ply (single scan)")
    parser.add_argument("--gt", help="GT STL point cloud .ply (single scan)")
    parser.add_argument("--obs_mask", default=None, help="ObsMask{scan}_10.mat")
    parser.add_argument("--plane", default=None, help="Plane{scan}.mat")
    parser.add_argument("--scan_list", default=None,
                        help="file of '<data.ply> <gt.ply> [obs.mat [plane.mat]]' "
                             "lines; aggregates over all of them")
    parser.add_argument("--data_dir", default=None,
                        help="directory of fused <method>{scan:03d}_l3.ply clouds")
    parser.add_argument("--gt_dir", default=None,
                        help="DTU SampleSet root (Points/stl, ObsMask)")
    parser.add_argument("--scans", type=int, nargs="+", default=None,
                        help="scan ids to aggregate with --data_dir/--gt_dir")
    parser.add_argument("--method", default="itermvs",
                        help="fused-cloud filename prefix (eval.py naming)")
    parser.add_argument("--density", type=float, default=DENSITY)
    parser.add_argument("--max_dist", type=float, default=MAX_DIST)
    parser.add_argument("--query_cap", type=int, default=None,
                        help="bound NN QUERY point counts (unbiased mean "
                             "estimate; tree targets stay exact)")
    args = parser.parse_args()

    multi = bool(args.scan_list) or bool(args.scans)
    if multi:
        if args.scans and not (args.data_dir and args.gt_dir):
            parser.error("--scans requires --data_dir and --gt_dir")
        results = []
        for data, gt, obs, plane, label in _scan_jobs(args):
            r = score(data, gt, obs, plane, args.density, args.max_dist,
                      args.query_cap)
            r["scan"] = label
            print(f"{label}: acc {r['accuracy_mm']:.4f} "
                  f"comp {r['completeness_mm']:.4f} "
                  f"overall {r['overall_mm']:.4f}")
            results.append(r)
        print(json.dumps(aggregate(results)))
        return
    if not (args.data and args.gt):
        parser.error("--data/--gt (single scan) or --scan_list/--scans required")
    print(json.dumps(score(args.data, args.gt, args.obs_mask, args.plane,
                           args.density, args.max_dist, args.query_cap)))


if __name__ == "__main__":
    main()
