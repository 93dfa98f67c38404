"""COLMAP sparse reconstruction → MVS input format converter.

Produces the layout the `custom` loader and fusion expect
(reference behavior: colmap_input.py):
    <out>/cams_1/%08d_cam.txt   extrinsic + intrinsic + depth range
    <out>/pair.txt              view-selection pairs with scores
    <out>/images/%08d.jpg       renamed images

Per-image depth ranges come from the 1%/99% percentiles of visible
3D-point depths (colmap_input.py:319-334); pair scores use the MVSNet
angle-gaussian heuristic exp(−(θ−θ0)²/2σ²), σ=σ1 below θ0 else σ2
(colmap_input.py:336-352) — here vectorized over shared points.
"""
from __future__ import annotations

import argparse
import os
import shutil
import struct
from dataclasses import dataclass, field

import numpy as np

CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5), 4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5), 8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}

PARAM_NAMES = {
    "SIMPLE_PINHOLE": ["f", "cx", "cy"],
    "PINHOLE": ["fx", "fy", "cx", "cy"],
    "SIMPLE_RADIAL": ["f", "cx", "cy", "k"],
    "SIMPLE_RADIAL_FISHEYE": ["f", "cx", "cy", "k"],
    "RADIAL": ["f", "cx", "cy", "k1", "k2"],
    "RADIAL_FISHEYE": ["f", "cx", "cy", "k1", "k2"],
    "OPENCV": ["fx", "fy", "cx", "cy", "k1", "k2", "p1", "p2"],
    "OPENCV_FISHEYE": ["fx", "fy", "cx", "cy", "k1", "k2", "k3", "k4"],
    "FULL_OPENCV": ["fx", "fy", "cx", "cy", "k1", "k2", "p1", "p2",
                    "k3", "k4", "k5", "k6"],
    "FOV": ["fx", "fy", "cx", "cy", "omega"],
    "THIN_PRISM_FISHEYE": ["fx", "fy", "cx", "cy", "k1", "k2", "p1", "p2",
                           "k3", "k4", "sx1", "sy1"],
}


@dataclass
class ColmapCamera:
    id: int
    model: str
    width: int
    height: int
    params: list


@dataclass
class ColmapImage:
    id: int
    qvec: np.ndarray
    tvec: np.ndarray
    camera_id: int
    name: str
    point3d_ids: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))


def _read(fid, nbytes, fmt):
    return struct.unpack("<" + fmt, fid.read(nbytes))


def read_cameras_binary(path):
    out = {}
    with open(path, "rb") as f:
        (n,) = _read(f, 8, "Q")
        for _ in range(n):
            cam_id, model_id, w, h = _read(f, 24, "iiQQ")
            name, num_params = CAMERA_MODELS[model_id]
            params = list(_read(f, 8 * num_params, "d" * num_params))
            out[cam_id] = ColmapCamera(cam_id, name, w, h, params)
    return out


def read_cameras_text(path):
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            el = line.split()
            out[int(el[0])] = ColmapCamera(int(el[0]), el[1], int(el[2]),
                                           int(el[3]), [float(x) for x in el[4:]])
    return out


def read_images_binary(path):
    out = []
    with open(path, "rb") as f:
        (n,) = _read(f, 8, "Q")
        for _ in range(n):
            props = _read(f, 64, "idddddddi")
            name = b""
            c = f.read(1)
            while c != b"\x00":
                name += c
                c = f.read(1)
            (npts,) = _read(f, 8, "Q")
            track = _read(f, 24 * npts, "ddq" * npts)
            p3d = np.asarray(track[2::3], np.int64)
            out.append(ColmapImage(props[0], np.asarray(props[1:5]),
                                   np.asarray(props[5:8]), props[8],
                                   name.decode("utf-8"), p3d))
    return out


def read_images_text(path):
    out = []
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip() and not ln.startswith("#")]
    for head, track in zip(lines[0::2], lines[1::2]):
        el = head.split()
        tr = track.split()
        out.append(ColmapImage(int(el[0]), np.asarray([float(x) for x in el[1:5]]),
                               np.asarray([float(x) for x in el[5:8]]),
                               int(el[8]), el[9],
                               np.asarray([int(x) for x in tr[2::3]], np.int64)))
    return out


def read_points3d_binary(path):
    xyz = {}
    with open(path, "rb") as f:
        (n,) = _read(f, 8, "Q")
        for _ in range(n):
            props = _read(f, 43, "QdddBBBd")
            (tl,) = _read(f, 8, "Q")
            _read(f, 8 * tl, "ii" * tl)
            xyz[props[0]] = np.asarray(props[1:4])
    return xyz


def read_points3d_text(path):
    xyz = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            el = line.split()
            xyz[int(el[0])] = np.asarray([float(x) for x in el[1:4]])
    return xyz


def read_model(path):
    if os.path.exists(os.path.join(path, "cameras.bin")):
        return (read_cameras_binary(os.path.join(path, "cameras.bin")),
                read_images_binary(os.path.join(path, "images.bin")),
                read_points3d_binary(os.path.join(path, "points3D.bin")))
    return (read_cameras_text(os.path.join(path, "cameras.txt")),
            read_images_text(os.path.join(path, "images.txt")),
            read_points3d_text(os.path.join(path, "points3D.txt")))


def quaternion_to_rotation(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
        [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y]])


def intrinsic_matrix(cam: ColmapCamera) -> np.ndarray:
    names = PARAM_NAMES[cam.model]
    p = dict(zip(names, cam.params))
    if "f" in p:
        p["fx"] = p["fy"] = p["f"]
    return np.array([[p["fx"], 0, p["cx"]], [0, p["fy"], p["cy"]], [0, 0, 1]])


def view_scores(images, points, extrinsics, theta0, sigma1, sigma2):
    """Pairwise angle-gaussian view-selection scores, vectorized."""
    n = len(images)
    centers = np.stack([-e[:3, :3].T @ e[:3, 3] for e in extrinsics])
    point_sets = [set(int(i) for i in im.point3d_ids if i != -1) for im in images]
    score = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            shared = point_sets[i] & point_sets[j]
            if not shared:
                continue
            p = np.stack([points[pid] for pid in shared])            # [S, 3]
            vi = centers[i] - p
            vj = centers[j] - p
            cos = np.sum(vi * vj, axis=1) / (
                np.linalg.norm(vi, axis=1) * np.linalg.norm(vj, axis=1))
            theta = np.degrees(np.arccos(np.clip(cos, -1, 1)))
            sigma = np.where(theta <= theta0, sigma1, sigma2)
            s = float(np.sum(np.exp(-((theta - theta0) ** 2) / (2 * sigma ** 2))))
            score[i, j] = score[j, i] = s
    return score


def main():
    parser = argparse.ArgumentParser(
        description="Convert colmap results into MVS input")
    parser.add_argument("--input_folder", type=str, help="Project input dir.")
    parser.add_argument("--output_folder", type=str, default="")
    parser.add_argument("--num_src_images", type=int, default=-1)
    parser.add_argument("--theta0", type=float, default=5)
    parser.add_argument("--sigma1", type=float, default=1)
    parser.add_argument("--sigma2", type=float, default=10)
    parser.add_argument("--convert_format", action="store_true", default=False)
    args = parser.parse_args()

    out_dir = args.output_folder or args.input_folder
    if not args.input_folder or not os.path.isdir(args.input_folder):
        raise SystemExit("Invalid input folder")

    image_dir = os.path.join(args.input_folder, "images")
    cameras, images, points = read_model(os.path.join(args.input_folder, "sparse"))
    n = len(images)

    intrinsics = {cid: intrinsic_matrix(cam) for cid, cam in cameras.items()}
    extrinsics = []
    for im in images:
        e = np.eye(4)
        e[:3, :3] = quaternion_to_rotation(im.qvec)
        e[:3, 3] = im.tvec
        extrinsics.append(e)

    # Depth ranges from 1%/99% percentiles of visible point depths.
    depth_ranges = []
    for i, im in enumerate(images):
        valid = [pid for pid in im.point3d_ids if pid != -1 and pid in points]
        pts = np.stack([points[pid] for pid in valid])
        z = (pts @ extrinsics[i][:3, :3].T + extrinsics[i][:3, 3])[:, 2]
        z = np.sort(z)
        depth_ranges.append((z[int(len(z) * 0.01)], z[int(len(z) * 0.99)]))

    score = view_scores(images, points, extrinsics,
                        args.theta0, args.sigma1, args.sigma2)
    num_src = args.num_src_images if args.num_src_images > 0 else n
    view_sel = []
    for i in range(n):
        order = np.argsort(score[i])[::-1][:num_src]
        view_sel.append([(int(k), float(score[i, k])) for k in order])

    cam_dir = os.path.join(out_dir, "cams_1")
    renamed_dir = os.path.join(out_dir, "images")
    os.makedirs(cam_dir, exist_ok=True)
    os.makedirs(renamed_dir, exist_ok=True)
    for i, im in enumerate(images):
        with open(os.path.join(cam_dir, f"{i:08d}_cam.txt"), "w") as f:
            f.write("extrinsic\n")
            for row in extrinsics[i]:
                f.write(" ".join(str(v) for v in row) + " \n")
            f.write("\nintrinsic\n")
            for row in intrinsics[im.camera_id]:
                f.write(" ".join(str(v) for v in row) + " \n")
            f.write("\n%f %f \n" % depth_ranges[i])

    with open(os.path.join(out_dir, "pair.txt"), "w") as f:
        f.write(f"{n}\n")
        for i, sel in enumerate(view_sel):
            f.write(f"{i}\n{len(sel)} ")
            for image_id, s in sel:
                f.write(f"{image_id} {s:f} ")
            f.write("\n")

    for i, im in enumerate(images):
        src = os.path.join(image_dir, im.name)
        dst = os.path.join(renamed_dir, f"{i:08d}.jpg")
        if args.convert_format:
            import cv2

            cv2.imwrite(dst, cv2.imread(src))
        else:
            shutil.copyfile(src, dst)
    print(f"wrote {n} cams + pair.txt + images to {out_dir}")


if __name__ == "__main__":
    main()
