"""Shared MVS dataset machinery, torch-free.

All loaders emit NHWC numpy samples with the reference's field layout
(dicts of 4-level pyramids; reference: datasets/dtu_yao.py:227-232):

    imgs:          level_0..3 → [V, H_l, W_l, 3] float32 in [−1, 1]
    proj_matrices: level_0..3 → [V, 4, 4]
    depth_min/max: float scalars
    (train) depth/mask: level_0..3 → [H_l, W_l, 1]
    (eval)  filename:   '<scan>/{}/<refview:08d>{}' template

Image pyramids follow the reference exactly: scale to [−1, 1], optional
INTER_LINEAR resize to the target, then INTER_LINEAR /2 /4 /8 pyramid
(dtu_yao.py:69-76). GT depth/mask pyramids use INTER_NEAREST
(dtu_yao.py:113-115).
"""
from __future__ import annotations

import os
import threading
from collections import OrderedDict

import numpy as np

LEVELS = 4


def _cv2():
    import cv2

    return cv2


def image_pyramid(img: np.ndarray, img_wh: tuple[int, int] | None,
                  uint8_level0: bool = False) -> dict:
    """[-1,1]-scaled multi-scale pyramid from an HWC uint8/float image.

    With `uint8_level0`, level_0 stays raw uint8 and the [-1,1] scaling
    happens on DEVICE (models.Pipeline normalizes uint8 inputs with the
    bit-identical expression `2·x/255 − 1`): the model consumes only
    level_0 pixels, and uint8 is 4× fewer bytes over the host→device
    link — the eval pipeline's largest transfer. Exact when the image
    is already at target size (no resize); a needed resize runs in
    uint8 (cv2 rounds to integer, ±0.5/255 vs the float32 path)."""
    cv2 = _cv2()
    raw = np.asarray(img)
    np_img = 2.0 * raw.astype(np.float32) / 255.0 - 1.0
    resize = (img_wh is not None
              and (np_img.shape[1], np_img.shape[0]) != tuple(img_wh))
    if resize:
        np_img = cv2.resize(np_img, tuple(img_wh), interpolation=cv2.INTER_LINEAR)
    h, w, _ = np_img.shape
    if uint8_level0:
        level0 = raw.astype(np.uint8, copy=False)
        if resize:
            level0 = cv2.resize(level0, tuple(img_wh),
                                interpolation=cv2.INTER_LINEAR)
    else:
        level0 = np_img
    return {
        "level_3": cv2.resize(np_img, (w // 8, h // 8), interpolation=cv2.INTER_LINEAR),
        "level_2": cv2.resize(np_img, (w // 4, h // 4), interpolation=cv2.INTER_LINEAR),
        "level_1": cv2.resize(np_img, (w // 2, h // 2), interpolation=cv2.INTER_LINEAR),
        "level_0": level0,
    }


class _PyramidCache:
    """Per-process LRU of decoded eval image pyramids.

    In the eval loaders every image appears in ~n_views samples (once
    as the reference, and as a source in each neighbor's view list),
    and PNG/JPEG decode + the 4-level resize pyramid dominates host
    time per sample (measured ~2.2 s/map vs 65 ms of device time on a
    1-core host, bench `eval_e2e_maps_per_sec`). Eval pyramids are a
    pure function of (path, img_wh, uint8_level0) — no jitter — so an
    LRU keyed on those plus (mtime, size) cuts decode work ~n_views×.
    Entries are returned by reference and marked read-only
    (`stack_views` copies into the batch). Thread-safe for the
    thread-pool loader; process-pool workers each hold their own.
    Capacity `ITERMVS_DECODE_CACHE_MB` (default 256; 0 disables).
    Training loaders do NOT use this (ColorJitter randomizes pixels)."""

    def __init__(self, cap_mb: float):
        self.cap = cap_mb * 1e6
        self.size = 0
        self.lock = threading.Lock()
        self.data: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def clear(self):
        with self.lock:
            self.data.clear()
            self.size = 0

    def set_cap(self, cap_mb: float):
        """Resize capacity (evicting LRU entries if over the new cap) —
        used by process-pool loader workers to split the configured
        budget across workers instead of multiplying it."""
        with self.lock:
            self.cap = cap_mb * 1e6
            while self.size > self.cap and len(self.data) > 1:
                _, (old, _) = self.data.popitem(last=False)
                self.size -= sum(a.nbytes for a in old.values())

    def get(self, path, img_wh, uint8_level0: bool):
        """(pyramid dict, original (w, h)) for an image file."""
        st = os.stat(path)
        key = (os.path.abspath(path),
               tuple(img_wh) if img_wh is not None else None,
               bool(uint8_level0), st.st_mtime_ns, st.st_size)
        with self.lock:
            entry = self.data.get(key)
            if entry is not None:
                self.hits += 1
                self.data.move_to_end(key)
                return entry
            self.misses += 1
        from PIL import Image

        pil = Image.open(path)
        orig_wh = pil.size
        pyr = image_pyramid(pil, img_wh, uint8_level0=uint8_level0)
        for a in pyr.values():
            a.setflags(write=False)
        entry = (pyr, orig_wh)
        if self.cap <= 0:
            return entry
        nbytes = sum(a.nbytes for a in pyr.values())
        with self.lock:
            if key not in self.data:      # concurrent miss: first wins
                self.data[key] = entry
                self.size += nbytes
                while self.size > self.cap and len(self.data) > 1:
                    _, (old, _) = self.data.popitem(last=False)
                    self.size -= sum(a.nbytes for a in old.values())
        return entry


_pyramid_cache = _PyramidCache(
    float(os.environ.get("ITERMVS_DECODE_CACHE_MB", "256")))


def cached_image_pyramid(path, img_wh, uint8_level0: bool = False):
    """LRU-cached decode + `image_pyramid` for EVAL loaders.

    Returns (pyramid dict of read-only arrays, original (w, h))."""
    return _pyramid_cache.get(path, img_wh, uint8_level0)


def clear_decode_cache():
    """Drop all cached pyramids (bench uses this so a timed eval pass
    starts decode-cold, like a real first-scan eval)."""
    _pyramid_cache.clear()


def split_decode_cache_cap(workers: int):
    """Shrink THIS process's decode-cache cap to 1/workers of the
    configured budget — called in each process-pool loader worker so
    the aggregate across workers stays within ITERMVS_DECODE_CACHE_MB."""
    _pyramid_cache.set_cap(
        float(os.environ.get("ITERMVS_DECODE_CACHE_MB", "256"))
        / max(1, workers))


def nearest_pyramid(arr: np.ndarray) -> dict:
    """INTER_NEAREST /1 /2 /4 /8 pyramid of an [H, W] float map."""
    cv2 = _cv2()
    h, w = arr.shape
    out = {}
    for i in range(LEVELS):
        out[f"level_{i}"] = cv2.resize(
            arr, (w // (2 ** i), h // (2 ** i)), interpolation=cv2.INTER_NEAREST)
    return out


def proj_matrix_pyramid(intrinsics: np.ndarray, extrinsics: np.ndarray) -> dict:
    """Per-level 4×4 projections `[K_l·E ; E_lastrow]`.

    `intrinsics` at full (level-0) resolution; level_l scales the first
    two K rows by 2^−l (reference dtu_yao.py:170-188 computes the same
    cumulative ×0.125/×2 ladder).
    """
    out = {}
    for level in range(LEVELS):
        k = intrinsics.copy()
        k[:2] *= 0.5 ** level
        p = extrinsics.copy()
        p[:3, :4] = k @ extrinsics[:3, :4]
        out[f"level_{level}"] = p
    return out


def stack_views(per_view: list[dict], keys=("level_0", "level_1", "level_2", "level_3")):
    """List of per-view level dicts → level dict of [V, ...] stacks."""
    return {k: np.stack([pv[k] for pv in per_view]) for k in keys}


def color_jitter(pil_img, rng, brightness=0.5, contrast=0.5):
    """torchvision-equivalent ColorJitter(brightness, contrast) on PIL.

    Random factors U[1−b, 1+b] / U[1−c, 1+c], applied in random order
    (reference training augmentation, dtu_yao.py:26,66-67).
    """
    from PIL import ImageEnhance

    ops = []
    b = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
    c = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
    ops.append(lambda im: ImageEnhance.Brightness(im).enhance(b))
    ops.append(lambda im: ImageEnhance.Contrast(im).enhance(c))
    order = rng.permutation(2)
    for i in order:
        pil_img = ops[i](pil_img)
    return pil_img


class MVSDatasetBase:
    """Minimal map-style dataset protocol (len / getitem)."""

    metas: list
    seed: int = 0
    _epoch: int = 0

    def __len__(self):
        return len(self.metas)

    def set_epoch(self, epoch: int):
        """Called by the DataLoader so per-item RNG varies across epochs."""
        self._epoch = int(epoch)

    def item_rng(self, idx: int) -> np.random.Generator:
        """Per-item generator: thread-safe under concurrent __getitem__
        (the loader's worker threads never share generator state) and
        reproducible — (seed, epoch, idx) fully determines the sample."""
        return np.random.default_rng((self.seed, self._epoch, int(idx)))

    def __getitem__(self, idx):
        raise NotImplementedError

    @staticmethod
    def read_pair_list(path):
        from itermvs_tpu.io import read_pair_file

        return read_pair_file(path)

    @staticmethod
    def read_cam(path):
        from itermvs_tpu.io import read_cam_file

        return read_cam_file(path)

    @staticmethod
    def read_image(path):
        from PIL import Image

        return Image.open(path)

    @staticmethod
    def expand_map(level_dict):
        """[H,W] float maps → [H,W,1] (NHWC channel axis)."""
        return {k: v[..., None].astype(np.float32) for k, v in level_dict.items()}
