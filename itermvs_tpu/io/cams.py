"""MVSNet-convention camera text files.

Layout (reference: datasets/dtu_yao.py:52-62, eval.py:56-65):

    extrinsic
    <4x4 world-to-camera matrix, rows on lines 1-4>
    (blank)
    intrinsic
    <3x3 K matrix, rows on lines 7-9>
    (blank)
    depth_min [interval [num] [depth_max]]   # line 11; we take first + last token
"""
from __future__ import annotations

import numpy as np


def read_cam_file(path: str) -> tuple[np.ndarray, np.ndarray, float, float]:
    """Return (intrinsics[3,3], extrinsics[4,4], depth_min, depth_max)."""
    with open(path) as f:
        lines = [line.rstrip() for line in f.readlines()]
    extrinsics = np.fromstring(" ".join(lines[1:5]), dtype=np.float32, sep=" ").reshape(4, 4)
    intrinsics = np.fromstring(" ".join(lines[7:10]), dtype=np.float32, sep=" ").reshape(3, 3)
    depth_tokens = lines[11].split()
    depth_min = float(depth_tokens[0])
    depth_max = float(depth_tokens[-1])
    return intrinsics, extrinsics, depth_min, depth_max


def read_camera_parameters(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Return (intrinsics[3,3], extrinsics[4,4]) only — fusion-side reader."""
    intrinsics, extrinsics, _, _ = _read_cam_no_depth(path)
    return intrinsics, extrinsics


def _read_cam_no_depth(path: str):
    with open(path) as f:
        lines = [line.rstrip() for line in f.readlines()]
    extrinsics = np.fromstring(" ".join(lines[1:5]), dtype=np.float32, sep=" ").reshape(4, 4)
    intrinsics = np.fromstring(" ".join(lines[7:10]), dtype=np.float32, sep=" ").reshape(3, 3)
    return intrinsics, extrinsics, None, None


def write_cam_file(path: str, intrinsics: np.ndarray, extrinsics: np.ndarray,
                   depth_min: float, depth_max: float,
                   depth_interval: float | None = None,
                   num_depth: int | None = None) -> None:
    """Write a cam txt; the depth line carries min [interval num] max."""
    with open(path, "w") as f:
        f.write("extrinsic\n")
        for row in np.asarray(extrinsics).reshape(4, 4):
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
        f.write("\nintrinsic\n")
        for row in np.asarray(intrinsics).reshape(3, 3):
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
        f.write("\n")
        if depth_interval is not None and num_depth is not None:
            f.write(f"{depth_min} {depth_interval} {num_depth} {depth_max}\n")
        else:
            f.write(f"{depth_min} {depth_max}\n")
