"""Point-cloud viewer (reference: visualize_ply.py, Open3D-based).

Uses Open3D when available (with viewpoint save/load like the
reference); falls back to a matplotlib 3-D scatter of a subsample, or
plain statistics in fully headless environments.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from itermvs_tpu.io import read_ply  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="Visualize a PLY point cloud")
    parser.add_argument("ply", help="path to .ply")
    parser.add_argument("--viewpoint", default=None,
                        help="json file to save/load the Open3D viewpoint")
    parser.add_argument("--max_points", type=int, default=500_000)
    args = parser.parse_args()

    try:
        import open3d as o3d

        pcd = o3d.io.read_point_cloud(args.ply)
        vis = o3d.visualization.Visualizer()
        vis.create_window()
        vis.add_geometry(pcd)
        ctr = vis.get_view_control()
        if args.viewpoint and os.path.exists(args.viewpoint):
            param = o3d.io.read_pinhole_camera_parameters(args.viewpoint)
            ctr.convert_from_pinhole_camera_parameters(param)
        vis.run()
        if args.viewpoint:
            param = ctr.convert_to_pinhole_camera_parameters()
            o3d.io.write_pinhole_camera_parameters(args.viewpoint, param)
        vis.destroy_window()
        return
    except ImportError:
        pass

    xyz, rgb = read_ply(args.ply)
    print(f"{args.ply}: {xyz.shape[0]} points")
    print("bbox min:", xyz.min(0), "max:", xyz.max(0))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        idx = np.random.default_rng(0).choice(
            xyz.shape[0], min(args.max_points, xyz.shape[0]), replace=False)
        fig = plt.figure(figsize=(10, 10))
        ax = fig.add_subplot(projection="3d")
        colors = rgb[idx] / 255.0 if rgb is not None else None
        ax.scatter(xyz[idx, 0], xyz[idx, 1], xyz[idx, 2], s=0.1, c=colors)
        out = os.path.splitext(args.ply)[0] + "_view.png"
        plt.savefig(out, dpi=150)
        print("saved", out)
    except ImportError:
        print("matplotlib unavailable; stats only")


if __name__ == "__main__":
    main()
