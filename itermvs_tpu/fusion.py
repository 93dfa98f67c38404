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
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

from itermvs_tpu.io import read_pfm, read_pair_file, read_camera_parameters
from itermvs_tpu.io.ply import PlyWriter
from itermvs_tpu.ops.grid_sample import gather_bilinear, pack_corners

# Source-axis padding buckets: the consistency kernel compiles once per
# bucket actually used (DTU always 10; ETH3D/Tanks vary by a few).
_SRC_BUCKETS = (2, 4, 6, 8, 10, 12, 16, 24, 32, 48, 64)


def _bucket(n: int) -> int:
    for b in _SRC_BUCKETS:
        if n <= b:
            return b
    return n


@functools.partial(jax.jit, static_argnames=(
    "geo_pixel_thres", "geo_depth_thres", "photo_thres", "geo_mask_thres"))
def _consistency_kernel(ref_depth, confidence, src_depths, src_valid,
                        rel_ref_to_src, rel_src_to_ref,
                        k_ref, k_ref_inv, k_srcs, k_srcs_inv,
                        geo_pixel_thres: float, geo_depth_thres: float,
                        photo_thres: float, geo_mask_thres: int):
    """Geometric + photometric filtering for one reference view.

    Args:
      ref_depth, confidence: [H, W].
      src_depths: [S, H, W] (S padded to a bucket size).
      src_valid: [S] float, 1 for real source views, 0 for padding.
      rel_ref_to_src: [S, 4, 4] extrinsic-only `E_src @ inv(E_ref)`.
      rel_src_to_ref: [S, 4, 4] inverse relative extrinsics.
      k_ref, k_ref_inv: [3, 3]; k_srcs, k_srcs_inv: [S, 3, 3].

    Returns (depth_q [H,W] uint16, lo, hi f32 scalars, mask_bits [H,W]
    uint8) with bit0 = photo mask, bit1 = geo mask, bit2 = final mask —
    the full epilogue (reference eval.py:236,258-263) runs on device,
    and the averaged depth crosses the (slow, tunnel-dependent) host
    link uint16-quantized against its own [lo, hi] range: the wire cost
    is ~5.5 MB/view instead of ~9 MB, and the dequantization error
    (hi−lo)/65535/2 is ≤0.004 mm at DTU depth ranges — two orders of
    magnitude under the 0.2 mm scorer density. Device→host bandwidth is
    the fusion wall-clock driver on slow-tunnel hosts (measured 12.0 of
    15.1 s/scene; see docs/PERFORMANCE.md "Fusion host tail").

    TPU notes (both bit-accuracy- and throughput-critical):
      * every matmul runs precision="highest" — the TPU default matmul
        precision rounds operands toward bfloat16, which at a 1600-pixel
        coordinate scale is a multi-pixel error that silently fails the
        `dist < 1 px` test almost everywhere;
      * the source-depth bilinear sample is ONE flat corner-packed row
        gather across all S views (view offset folded into the row
        index) — a vmap'd per-view gather lowers to XLA's batched-gather
        path, which scalarizes on TPU (measured seconds per call at
        1600×1152 vs milliseconds for the flat gather).
    """
    h, w = ref_depth.shape
    s = src_depths.shape[0]
    hi = jax.lax.Precision.HIGHEST
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    ones = jnp.ones_like(gx)
    pix = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)        # [P, 3]

    # Reference pixels → reference camera space.
    xyz_ref = jnp.einsum("pj,ij->pi", pix, k_ref_inv,
                         precision=hi) * ref_depth.reshape(-1, 1)  # [P, 3]

    # → source camera space → source pixels, all views at once.
    xyz_src = (jnp.einsum("pj,sij->spi", xyz_ref, rel_ref_to_src[:, :3, :3],
                          precision=hi)
               + rel_ref_to_src[:, None, :3, 3])                   # [S, P, 3]
    k_xyz = jnp.einsum("spj,sij->spi", xyz_src, k_srcs, precision=hi)
    xy_src = k_xyz[..., :2] / k_xyz[..., 2:3]                      # [S, P, 2]

    # Bilinear-sample each source depth at its projected coords with
    # zeros padding (cv2.remap INTER_LINEAR + BORDER_CONSTANT(0)): one
    # flat gather over the corner-packed [S·H·W, 4] table.
    packed = pack_corners(src_depths[..., None])
    sampled = gather_bilinear(packed, xy_src[..., 0],
                              xy_src[..., 1])[..., 0]              # [S, P]

    # Reproject with the sampled source depth back into the ref view.
    xy1 = jnp.concatenate([xy_src, jnp.ones((s, h * w, 1))], axis=-1)
    xyz_src2 = jnp.einsum("spj,sij->spi", xy1, k_srcs_inv,
                          precision=hi) * sampled[..., None]
    xyz_rep = (jnp.einsum("spj,sij->spi", xyz_src2, rel_src_to_ref[:, :3, :3],
                          precision=hi)
               + rel_src_to_ref[:, None, :3, 3])                   # [S, P, 3]
    depth_rep = xyz_rep[..., 2].reshape(s, h, w)
    k_rep = jnp.einsum("spj,ij->spi", xyz_rep, k_ref, precision=hi)
    xy_rep = k_rep[..., :2] / (k_rep[..., 2:3] + 1e-6)
    x_rep = xy_rep[..., 0].reshape(s, h, w)
    y_rep = xy_rep[..., 1].reshape(s, h, w)

    dist = jnp.sqrt((x_rep - gx) ** 2 + (y_rep - gy) ** 2)
    relative = jnp.abs(depth_rep - ref_depth) / ref_depth
    mask = ((dist < geo_pixel_thres) & (relative < geo_depth_thres)
            & (src_valid[:, None, None] > 0))
    geo_sum = mask.astype(jnp.int32).sum(0)
    reproj_sum = jnp.where(mask, depth_rep, 0.0).sum(0)

    depth_averaged = (reproj_sum + ref_depth) / (geo_sum + 1).astype(jnp.float32)
    photo = confidence > photo_thres
    geo = geo_sum >= geo_mask_thres
    bits = (photo.astype(jnp.uint8)
            + (geo.astype(jnp.uint8) << 1)
            + ((photo & geo).astype(jnp.uint8) << 2))
    lo = depth_averaged.min()
    hi = depth_averaged.max()
    span = jnp.maximum(hi - lo, 1e-6)
    depth_q = jnp.clip(jnp.round((depth_averaged - lo) * (65535.0 / span)),
                       0, 65535).astype(jnp.uint16)
    return depth_q, lo, hi, bits


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
        # The depth map lives on DEVICE in the cache: a view serves as a
        # source for ~10 ref views (DTU pair topology), and re-uploading
        # the [S,H,W] source stack per ref view is ~44 MB over a host
        # link that can be the bottleneck — cached device copies make
        # the per-ref stack a device-local concatenate instead.
        entry = dict(K=intr, E=extr, depth=depth,
                     depth_dev=jnp.asarray(depth))
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
                 geo_mask_thres=3, verbose=True, display=False,
                 finalize_workers=None):
    """Fuse one scan's depth maps into a colored PLY (reference eval.py:212-309).

    The main thread streams host prep, async kernel dispatches and the
    device→host result fetches (transfers MUST stay single-threaded:
    concurrent fetches through the device transport were measured to
    serialize at ~200 thread-seconds/view vs ~1 s sequential). Each
    view's pure-host tail — mask PNGs, color decode, back-projection,
    PLY append — runs on a `finalize_workers`-thread pool, overlapping
    the kernels and transfers. PLY appends are serialized by a lock;
    vertex order in the cloud is therefore nondeterministic across
    runs, which no consumer depends on.

    `finalize_workers` defaults to min(4, cpu_count): extra threads
    only help when there are cores to run them — on a 1-core host more
    threads just add GIL contention (measured 71.6 s vs 25-57 s per
    7-view 1600×1152 scene at 4 vs 1 workers).

    Set ITERMVS_FUSION_TIMING=1 to print a per-phase wall-time summary.

    Returns (n_points, elapsed_seconds)."""
    if finalize_workers is None:
        finalize_workers = max(1, min(4, os.cpu_count() or 1))
    start = time.time()
    pair_data = read_pair_file(os.path.join(scan_folder, "pair.txt"))
    max_srcs = max((len(srcs) for _, srcs in pair_data), default=0)
    cache = _ViewCache(scan_folder, out_folder, img_wh,
                       maxsize=max(max_srcs + 2, 12))

    os.makedirs(os.path.join(out_folder, "mask"), exist_ok=True)
    ply = PlyWriter(plyfilename)
    ply_lock = threading.Lock()
    # Flat pixel grids, built once per scan and shared read-only by all
    # finalize threads (they were ~30 MB of per-view re-allocation).
    gw, gh = img_wh
    grid_x = np.tile(np.arange(gw, dtype=np.float32), gh)
    grid_y = np.repeat(np.arange(gh, dtype=np.float32), gw)
    phases = collections.defaultdict(float)
    phases_lock = threading.Lock()

    def timed(phase, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        dt = time.perf_counter() - t0
        with phases_lock:
            phases[phase] += dt
        return out

    def dispatch(ref_view, src_views):
        """Host prep + async kernel launch for one reference view.

        Runs on the main thread only: the LRU view cache is not
        thread-safe, and the device queue keeps kernels ordered."""
        ref = cache.view(ref_view)
        conf = cache.confidence(ref_view)

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
        # Device-local stack of the cached device depth maps — no
        # host→device re-upload of source depths per ref view.
        src_depths = jnp.stack([v["depth_dev"] for v in srcs])

        out = _consistency_kernel(
            ref["depth_dev"], jnp.asarray(conf),
            src_depths, jnp.asarray(src_valid),
            jnp.asarray(rel_r2s), jnp.asarray(rel_s2r),
            jnp.asarray(ref["K"]),
            jnp.asarray(np.linalg.inv(
                ref["K"].astype(np.float64)).astype(np.float32)),
            jnp.asarray(k_srcs), jnp.asarray(k_srcs_inv),
            geo_pixel_thres=float(geo_pixel_thres),
            geo_depth_thres=float(geo_depth_thres),
            photo_thres=float(photo_thres),
            geo_mask_thres=int(geo_mask_thres),
        )
        # Start the device→host copies now: they run as soon as the
        # async kernel finishes and overlap the NEXT view's host prep +
        # dispatch, instead of paying one blocking round trip per array
        # in fetch (4 arrays/view; ~26 ms/sync on tunnel transports —
        # same scheme as eval.py's result wire).
        for x in out:
            try:
                x.copy_to_host_async()
            except AttributeError:
                pass
        return ref_view, ref, out

    def fetch(out):
        """Device→host fetch of one view's kernel results.

        MAIN THREAD ONLY: concurrent fetches through the device
        transport serialize pathologically (measured ~200 thread-
        seconds per view when 4 finalize threads fetched their own
        results vs ~1 s sequential), so transfers stay single-threaded
        and only the pure-host tail goes to the pool."""
        depth_q, lo, hi, bits = out
        return (timed("fetch", lambda: np.asarray(depth_q)),
                float(lo), float(hi),
                timed("fetch", lambda: np.asarray(bits)))

    def finalize(ref_view, ref, depth_q, lo, hi, bits):
        """One view's host tail: masks, color decode, back-projection,
        PLY append. Runs on the finalize pool — touches only
        thread-safe state (direct file reads, the locked PLY writer,
        the phase timers)."""
        photo_mask = (bits & 1) > 0
        geo_mask = (bits & 2) > 0
        final_mask = (bits & 4) > 0
        ref_img = timed("image_decode", cache.image, ref_view)

        timed("mask_png", _save_mask,
              os.path.join(out_folder, f"mask/{ref_view:0>8}_photo.png"), photo_mask)
        timed("mask_png", _save_mask,
              os.path.join(out_folder, f"mask/{ref_view:0>8}_geo.png"), geo_mask)
        timed("mask_png", _save_mask,
              os.path.join(out_folder, f"mask/{ref_view:0>8}_final.png"), final_mask)

        if verbose:
            print(
                f"processing {scan_folder}, ref-view{ref_view:0>2}, "
                f"geo_mask:{geo_mask.mean():3f} photo_mask:{photo_mask.mean():3f} "
                f"final_mask: {final_mask.mean():3f}")
        if display:
            _save_display(out_folder, ref_view, ref_img, ref["depth"],
                          photo_mask, geo_mask, final_mask)

        def backproject():
            # Row-major [P, 3] back-projection with K⁻¹/E⁻¹ folded into
            # one 3×4 affine. Matrix inverses in f64, bulk math in f32:
            # the pixel·depth products round at ~magnitude·6e-8 and the
            # linear maps preserve RELATIVE error, so world coordinates
            # land within ~1e-4 mm at DTU scales — far under the 0.2 mm
            # scorer density. f32 matters on the host: this is per-view
            # work on what may be a single CPU core (measured 2-3×).
            idx = np.flatnonzero(final_mask.ravel())
            # Dequantize the uint16 wire format only at surviving pixels.
            step = np.float32((hi - lo) / 65535.0)
            depth = (np.float32(lo)
                     + depth_q.ravel().take(idx).astype(np.float32) * step)
            pix = np.empty((idx.size, 3), np.float32)
            np.multiply(grid_x.take(idx), depth, out=pix[:, 0])
            np.multiply(grid_y.take(idx), depth, out=pix[:, 1])
            pix[:, 2] = depth
            k_inv = np.linalg.inv(ref["K"].astype(np.float64))
            e_inv = np.linalg.inv(ref["E"].astype(np.float64))
            m = (e_inv[:3, :3] @ k_inv).astype(np.float32)  # pixel→world
            xyz_world = pix @ m.T + e_inv[:3, 3].astype(np.float32)
            colors = (ref_img.reshape(-1, 3).take(idx, axis=0)
                      * np.float32(255)).astype(np.uint8)
            return xyz_world, colors

        xyz_f32, colors = timed("backproject", backproject)
        # Stream this view's points to disk now — writes from concurrent
        # finalizers serialize on the lock; cloud order is irrelevant.
        with ply_lock:
            timed("ply_write", ply.add, xyz_f32, colors)

    # Software pipeline: the main thread streams host prep, kernel
    # dispatches AND result fetches (dispatch i+1 is in flight while
    # view i transfers); each view's pure-host tail (PNGs, color
    # decode, back-projection, PLY append) runs on the finalize pool,
    # overlapping the kernels, the transfers and other views' tails.
    # Outstanding tails are bounded to cap in-flight memory.
    max_outstanding = max(2 * finalize_workers, 2)
    try:
        with ThreadPoolExecutor(max_workers=finalize_workers) as pool:
            futures = collections.deque()
            pending = None
            for ref_view, src_views in pair_data:
                launched = timed("dispatch", dispatch, ref_view, src_views)
                if pending is not None:
                    rv, ref, out = pending
                    futures.append(pool.submit(finalize, rv, ref, *fetch(out)))
                pending = launched
                while len(futures) >= max_outstanding:
                    futures.popleft().result()
            if pending is not None:
                rv, ref, out = pending
                futures.append(pool.submit(finalize, rv, ref, *fetch(out)))
            while futures:
                futures.popleft().result()
    except BaseException:
        ply.close()   # patch the header so the partial PLY stays readable
        raise

    n_points = ply.close()
    elapsed = time.time() - start
    if os.environ.get("ITERMVS_FUSION_TIMING"):
        total = sum(phases.values())
        detail = " ".join(f"{k}={v:.2f}s" for k, v in
                          sorted(phases.items(), key=lambda kv: -kv[1]))
        print(f"fusion timing (thread-seconds, wall {elapsed:.2f}s, "
              f"sum {total:.2f}s): {detail}")
    print(f"saving the final model to {plyfilename} "
          f"({n_points} points, {elapsed:.2f}s)")
    return n_points, elapsed
