"""Minimal binary-little-endian PLY point-cloud codec.

Produces the same vertex layout the reference emits via `plyfile`
(reference: eval.py:296-309): x/y/z float32 + red/green/blue uint8,
element name `vertex`. No external dependency.
"""
from __future__ import annotations

import numpy as np

try:  # native fast path (native/itermvs_io)
    import itermvs_io as _native
except ImportError:
    _native = None

_VERTEX_DTYPE = np.dtype([
    ("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
    ("red", "u1"), ("green", "u1"), ("blue", "u1"),
])


def write_ply(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """Write points xyz [N,3] float and colors rgb [N,3] uint8 to a binary PLY."""
    xyz = np.asarray(xyz, dtype=np.float32)
    rgb = np.asarray(rgb, dtype=np.uint8)
    if xyz.ndim != 2 or xyz.shape[1] != 3 or rgb.shape != xyz.shape:
        raise ValueError(f"bad point-cloud shapes xyz={xyz.shape} rgb={rgb.shape}")
    n = xyz.shape[0]
    if _native is not None:
        _native.write_ply_raw(path, np.ascontiguousarray(xyz),
                              np.ascontiguousarray(rgb), n)
        return
    # Interleave via two block byte-copies instead of six per-column
    # strided scatters (~4x faster at 10M+ points).
    buf = np.empty((n, _VERTEX_DTYPE.itemsize), np.uint8)
    buf[:, 0:12] = np.ascontiguousarray(xyz).view(np.uint8).reshape(n, 12)
    buf[:, 12:15] = rgb
    vertices = buf.reshape(-1).view(_VERTEX_DTYPE)

    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\n"
        "property float y\n"
        "property float z\n"
        "property uchar red\n"
        "property uchar green\n"
        "property uchar blue\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        vertices.tofile(f)


class PlyWriter:
    """Streaming binary PLY writer: vertices are appended chunk by chunk
    and the header's vertex count is patched on close (written as a
    zero-padded 12-digit integer, which every ASCII-int parser reads).

    Lets fusion write each reference view's points as they are produced
    — the disk IO overlaps the next view's compute and the full cloud
    never accumulates in memory.
    """

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._n = 0
        header_head = "ply\nformat binary_little_endian 1.0\nelement vertex "
        self._f.write(header_head.encode("ascii"))
        self._count_offset = self._f.tell()
        self._f.write(b"000000000000\n")
        self._f.write(
            b"property float x\nproperty float y\nproperty float z\n"
            b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
            b"end_header\n")

    def add(self, xyz: np.ndarray, rgb: np.ndarray) -> None:
        xyz = np.ascontiguousarray(xyz, dtype=np.float32)
        rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
        if xyz.ndim != 2 or xyz.shape[1] != 3 or rgb.shape != xyz.shape:
            raise ValueError(f"bad chunk shapes xyz={xyz.shape} rgb={rgb.shape}")
        n = xyz.shape[0]
        if n == 0:
            return
        buf = np.empty((n, _VERTEX_DTYPE.itemsize), np.uint8)
        buf[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
        buf[:, 12:15] = rgb
        buf.tofile(self._f)
        self._n += n

    def close(self) -> int:
        self._f.seek(self._count_offset)
        self._f.write(f"{self._n:012d}".encode("ascii"))
        self._f.close()
        return self._n

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_ply(path: str) -> tuple[np.ndarray, np.ndarray | None]:
    """Read a PLY point cloud; returns (xyz [N,3] f32, rgb [N,3] u8 or None).

    Supports binary_little_endian and ascii with float32/float64 x/y/z and
    optional uchar red/green/blue — enough for our own output and for DTU
    ground-truth clouds.
    """
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        n = None
        props: list[tuple[str, str]] = []
        in_vertex = False
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: truncated header")
            tokens = line.decode("ascii", "replace").strip().split()
            if not tokens:
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                in_vertex = tokens[1] == "vertex"
                if in_vertex:
                    n = int(tokens[2])
            elif tokens[0] == "property" and in_vertex:
                props.append((tokens[1], tokens[2]))
            elif tokens[0] == "end_header":
                break

        if n is None:
            raise ValueError(f"{path}: no vertex element")
        type_map = {
            "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
            "uchar": "u1", "uint8": "u1", "int": "<i4", "int32": "<i4",
            "uint": "<u4", "short": "<i2", "ushort": "<u2",
        }
        dtype = np.dtype([(name, type_map[t]) for t, name in props])
        if fmt == "binary_little_endian":
            data = np.fromfile(f, dtype=dtype, count=n)
        elif fmt == "ascii":
            data = np.loadtxt(f, dtype=dtype, max_rows=n)
        else:
            raise ValueError(f"{path}: unsupported PLY format {fmt}")

    xyz = np.stack([data["x"], data["y"], data["z"]], axis=1).astype(np.float32)
    if all(c in dtype.names for c in ("red", "green", "blue")):
        rgb = np.stack([data["red"], data["green"], data["blue"]], axis=1).astype(np.uint8)
    else:
        rgb = None
    return xyz, rgb
