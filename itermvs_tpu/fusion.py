"""Depth-map fusion: photometric + geometric filtering → colored point cloud.

TPU-native re-design of the reference fusion stage (eval.py:154-309).
The reference loops per (ref, src) pair in NumPy + cv2.remap; here the
geometric-consistency check is one jitted, source-view-batched kernel:

  * project reference pixels into each source view (dense matmuls),
  * bilinearly sample the source depth maps (same grid_sample primitive
    as the model's warp — cv2.remap INTER_LINEAR + BORDER_CONSTANT(0)
    is exactly zeros-padded bilinear),
  * reproject back, test pixel distance < geo_pixel_thres and relative
    depth difference < geo_depth_thres (eval.py:201-206),
  * accumulate consistent-view counts and reprojected-depth sums.

Unlike the reference (which re-reads every source PFM once per ref view,
eval.py:223-252), views stream through an LRU cache of decoded depth
maps sized to the scan's source count, so peak memory stays O(n_views)
rather than O(scan). The source axis is padded to a small set of bucket
sizes so the consistency kernel compiles O(1) times per scan regardless
of how many distinct source counts the pair file contains (ETH3D).

Only PLY assembly and PNG mask writing stay on the host. The on-disk
seam (PFM depth/confidence under <outdir>/<scan>/{depth_est,confidence})
and output formats are identical to the reference.
"""
from __future__ import annotations

import collections
import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from itermvs_tpu.io import read_pfm, read_pair_file, read_camera_parameters, write_ply
from itermvs_tpu.ops.grid_sample import grid_sample

# Source-axis padding buckets: the consistency kernel compiles once per
# bucket actually used (DTU always 10; ETH3D/Tanks vary by a few).
_SRC_BUCKETS = (2, 4, 6, 8, 10, 12, 16, 24, 32, 48, 64)


def _bucket(n: int) -> int:
    for b in _SRC_BUCKETS:
        if n <= b:
            return b
    return n


@functools.partial(jax.jit, static_argnames=("geo_pixel_thres", "geo_depth_thres"))
def _consistency_kernel(ref_depth, src_depths, src_valid,
                        rel_ref_to_src, rel_src_to_ref,
                        k_ref, k_ref_inv, k_srcs, k_srcs_inv,
                        geo_pixel_thres: float, geo_depth_thres: float):
    """Batched geometric-consistency check.

    Args:
      ref_depth: [H, W].
      src_depths: [S, H, W] (S padded to a bucket size).
      src_valid: [S] float, 1 for real source views, 0 for padding.
      rel_ref_to_src: [S, 4, 4] extrinsic-only `E_src @ inv(E_ref)`.
      rel_src_to_ref: [S, 4, 4] inverse relative extrinsics.
      k_ref, k_ref_inv: [3, 3]; k_srcs, k_srcs_inv: [S, 3, 3].

    Returns (geo_mask_sum [H,W] int32, reproj_depth_sum [H,W] f32).
    """
    h, w = ref_depth.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    ones = jnp.ones_like(gx)
    pix = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)        # [P, 3]

    # Reference pixels → reference camera space.
    xyz_ref = (pix @ k_ref_inv.T) * ref_depth.reshape(-1, 1)       # [P, 3]

    def per_view(src_depth, valid, r2s, s2r, k_src, k_src_inv):
        # → source camera space → source pixels.
        xyz_src = xyz_ref @ r2s[:3, :3].T + r2s[:3, 3]
        k_xyz = xyz_src @ k_src.T
        xy_src = k_xyz[:, :2] / k_xyz[:, 2:3]

        # Sample source depth at projected coords (zeros padding).
        grid = jnp.stack(
            [xy_src[:, 0] / ((w - 1) / 2.0) - 1.0,
             xy_src[:, 1] / ((h - 1) / 2.0) - 1.0], axis=-1
        ).reshape(1, h, w, 2)
        sampled = grid_sample(src_depth[None, :, :, None], grid)[0, ..., 0]

        # Reproject with the sampled source depth back into the ref view.
        xyz_src2 = (jnp.concatenate([xy_src, jnp.ones((h * w, 1))], axis=1)
                    @ k_src_inv.T) * sampled.reshape(-1, 1)
        xyz_rep = xyz_src2 @ s2r[:3, :3].T + s2r[:3, 3]
        depth_rep = xyz_rep[:, 2].reshape(h, w)
        k_rep = xyz_rep @ k_ref.T
        xy_rep = k_rep[:, :2] / (k_rep[:, 2:3] + 1e-6)
        x_rep = xy_rep[:, 0].reshape(h, w)
        y_rep = xy_rep[:, 1].reshape(h, w)

        dist = jnp.sqrt((x_rep - gx) ** 2 + (y_rep - gy) ** 2)
        depth_diff = jnp.abs(depth_rep - ref_depth)
        relative = depth_diff / ref_depth
        mask = (dist < geo_pixel_thres) & (relative < geo_depth_thres) & (valid > 0)
        return mask, jnp.where(mask, depth_rep, 0.0)

    masks, reprojected = jax.vmap(per_view)(
        src_depths, src_valid, rel_ref_to_src, rel_src_to_ref, k_srcs, k_srcs_inv)
    return masks.astype(jnp.int32).sum(0), reprojected.sum(0)


class _ViewCache:
    """LRU cache of decoded per-view fusion inputs (camera + depth map).

    The pair list visits each view as a source many times (DTU: ~10×);
    the reference re-reads the PFM from disk each time (eval.py:251).
    Here decoded views stay cached up to `maxsize` entries, bounding
    peak memory at O(source count), not O(scan size).
    """

    def __init__(self, scan_folder, out_folder, img_wh, maxsize):
        self.scan_folder = scan_folder
        self.out_folder = out_folder
        self.img_wh = img_wh
        self.maxsize = maxsize
        self._cache = collections.OrderedDict()

    def view(self, vid):
        """dict(K [3,3] rescaled to img_wh, E [4,4], depth [H,W]).

        Intrinsics are rescaled by this view's own original image size
        (reference eval.py:228-230, 247-249); only the header is read
        for the dimensions, not the pixels."""
        if vid in self._cache:
            self._cache.move_to_end(vid)
            return self._cache[vid]
        from PIL import Image

        intr, extr = read_camera_parameters(
            os.path.join(self.scan_folder, f"cams_1/{vid:0>8}_cam.txt"))
        img_path = os.path.join(self.scan_folder, f"images/{vid:0>8}.jpg")
        ow, oh = Image.open(img_path).size
        intr = intr.copy()
        intr[0] *= self.img_wh[0] / ow
        intr[1] *= self.img_wh[1] / oh
        depth = read_pfm(
            os.path.join(self.out_folder, f"depth_est/{vid:0>8}.pfm"))[0][..., 0]
        entry = dict(K=intr, E=extr, depth=depth)
        self._cache[vid] = entry
        while len(self._cache) > self.maxsize:
            self._cache.popitem(last=False)
        return entry

    def confidence(self, vid):
        """Confidence map — each view is a ref exactly once, so not cached."""
        return read_pfm(
            os.path.join(self.out_folder, f"confidence/{vid:0>8}.pfm"))[0][..., 0]

    def image(self, vid):
        """RGB [H,W,3] in [0,1] at img_wh — only ever needed for the
        current ref view (point colors), so not cached."""
        import cv2

        img_path = os.path.join(self.scan_folder, f"images/{vid:0>8}.jpg")
        img = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
        return cv2.resize(img.astype(np.float32) / 255.0, self.img_wh,
                          interpolation=cv2.INTER_LINEAR)


def _save_mask(path, mask):
    from PIL import Image

    Image.fromarray((mask.astype(np.uint8)) * 255).save(path)


def _save_display(out_folder, ref_view, ref_img, ref_depth, photo_mask,
                  geo_mask, final_mask):
    """Headless equivalent of the reference's cv2.imshow panel
    (eval.py:273-278): the same five images, written as PNGs under
    <out_folder>/display/ instead of shown in windows."""
    from PIL import Image

    disp = os.path.join(out_folder, "display")
    os.makedirs(disp, exist_ok=True)
    scale = max(float(ref_depth.max()), 1e-6)

    def _gray(x):
        return Image.fromarray(
            np.clip(x / scale * 255.0, 0, 255).astype(np.uint8))

    Image.fromarray((np.clip(ref_img, 0, 1) * 255).astype(np.uint8)).save(
        os.path.join(disp, f"{ref_view:0>8}_ref_img.png"))
    _gray(ref_depth).save(os.path.join(disp, f"{ref_view:0>8}_ref_depth.png"))
    _gray(ref_depth * photo_mask).save(
        os.path.join(disp, f"{ref_view:0>8}_depth_photo_mask.png"))
    _gray(ref_depth * geo_mask).save(
        os.path.join(disp, f"{ref_view:0>8}_depth_geo_mask.png"))
    _gray(ref_depth * final_mask).save(
        os.path.join(disp, f"{ref_view:0>8}_depth_final_mask.png"))


def filter_depth(scan_folder, out_folder, plyfilename, geo_pixel_thres=1.0,
                 geo_depth_thres=0.01, photo_thres=0.3, img_wh=(1600, 1152),
                 geo_mask_thres=3, verbose=True, display=False):
    """Fuse one scan's depth maps into a colored PLY (reference eval.py:212-309).

    Returns (n_points, elapsed_seconds)."""
    start = time.time()
    pair_data = read_pair_file(os.path.join(scan_folder, "pair.txt"))
    max_srcs = max((len(srcs) for _, srcs in pair_data), default=0)
    cache = _ViewCache(scan_folder, out_folder, img_wh,
                       maxsize=max(max_srcs + 2, 12))

    os.makedirs(os.path.join(out_folder, "mask"), exist_ok=True)
    vertices = []
    colors = []

    for ref_view, src_views in pair_data:
        ref = cache.view(ref_view)
        ref_img = cache.image(ref_view)
        k_ref = ref["K"]
        conf = cache.confidence(ref_view)
        photo_mask = conf > photo_thres

        # Pad the source axis to a bucket size so the kernel compiles
        # once per bucket; padded slots replicate source 0 and are
        # masked out via src_valid.
        s = len(src_views)
        b = _bucket(s)
        idx = list(range(s)) + [0] * (b - s)
        srcs = [cache.view(src_views[i]) for i in idx]
        src_valid = np.zeros(b, np.float32)
        src_valid[:s] = 1.0

        e_ref_inv = np.linalg.inv(ref["E"].astype(np.float64))
        rel_r2s = np.stack([
            (v["E"].astype(np.float64) @ e_ref_inv) for v in srcs
        ]).astype(np.float32)
        rel_s2r = np.stack([
            (ref["E"].astype(np.float64)
             @ np.linalg.inv(v["E"].astype(np.float64)))
            for v in srcs
        ]).astype(np.float32)

        k_srcs = np.stack([v["K"] for v in srcs])
        k_srcs_inv = np.stack([
            np.linalg.inv(k.astype(np.float64)) for k in k_srcs
        ]).astype(np.float32)
        src_depths = np.stack([v["depth"] for v in srcs])

        geo_sum, reproj_sum = _consistency_kernel(
            jnp.asarray(ref["depth"]), jnp.asarray(src_depths),
            jnp.asarray(src_valid),
            jnp.asarray(rel_r2s), jnp.asarray(rel_s2r),
            jnp.asarray(k_ref),
            jnp.asarray(np.linalg.inv(k_ref.astype(np.float64)).astype(np.float32)),
            jnp.asarray(k_srcs), jnp.asarray(k_srcs_inv),
            geo_pixel_thres=float(geo_pixel_thres),
            geo_depth_thres=float(geo_depth_thres),
        )
        geo_sum = np.asarray(geo_sum)
        reproj_sum = np.asarray(reproj_sum)

        depth_averaged = (reproj_sum + ref["depth"]) / (geo_sum + 1)
        geo_mask = geo_sum >= geo_mask_thres
        final_mask = photo_mask & geo_mask

        _save_mask(os.path.join(out_folder, f"mask/{ref_view:0>8}_photo.png"), photo_mask)
        _save_mask(os.path.join(out_folder, f"mask/{ref_view:0>8}_geo.png"), geo_mask)
        _save_mask(os.path.join(out_folder, f"mask/{ref_view:0>8}_final.png"), final_mask)

        if verbose:
            print(
                f"processing {scan_folder}, ref-view{ref_view:0>2}, "
                f"geo_mask:{geo_mask.mean():3f} photo_mask:{photo_mask.mean():3f} "
                f"final_mask: {final_mask.mean():3f}")
        if display:
            _save_display(out_folder, ref_view, ref_img, ref["depth"],
                          photo_mask, geo_mask, final_mask)

        height, width = depth_averaged.shape
        gx, gy = np.meshgrid(np.arange(width), np.arange(height))
        valid = final_mask
        x, y, depth = gx[valid], gy[valid], depth_averaged[valid]
        color = ref_img[valid]

        k_inv = np.linalg.inv(k_ref.astype(np.float64))
        e_inv = np.linalg.inv(ref["E"].astype(np.float64))
        xyz_ref = k_inv @ (np.vstack([x, y, np.ones_like(x)]) * depth)
        xyz_world = (e_inv @ np.vstack([xyz_ref, np.ones_like(x)]))[:3]
        vertices.append(xyz_world.T.astype(np.float32))
        colors.append((color * 255).astype(np.uint8))

    xyz = np.concatenate(vertices, axis=0)
    rgb = np.concatenate(colors, axis=0)
    write_ply(plyfilename, xyz, rgb)
    elapsed = time.time() - start
    print(f"saving the final model to {plyfilename} "
          f"({xyz.shape[0]} points, {elapsed:.2f}s)")
    return xyz.shape[0], elapsed
