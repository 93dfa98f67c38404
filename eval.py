"""Predict depth, filter, and fuse — CLI-compatible with the reference eval.py.

Depth estimation runs as one jitted test-mode forward per batch on TPU;
depth/confidence maps stream to PFM files (the same on-disk seam the
reference uses, eval.py:141-151), then fusion (itermvs_tpu.fusion) runs
per scan with the reference's per-dataset thresholds (eval.py:312-419).
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp

from itermvs_tpu.data import find_dataset_def
from itermvs_tpu.data.loader import DataLoader
from itermvs_tpu.engine.checkpoint import load_variables
from itermvs_tpu.fusion import filter_depth
from itermvs_tpu.io import save_pfm
from itermvs_tpu.models import Pipeline
from itermvs_tpu.utils import enable_persistent_cache, respect_jax_platforms_env

respect_jax_platforms_env()
enable_persistent_cache()

parser = argparse.ArgumentParser(description="Predict depth, filter, and fuse")
parser.add_argument("--model", default="IterMVS", help="select model")
parser.add_argument("--dataset", default="dtu_yao_eval", help="select dataset")
parser.add_argument("--testpath", help="testing data path")
parser.add_argument("--testlist", help="testing scan list")
parser.add_argument("--split", default="intermediate", help="select data")
parser.add_argument("--batch_size", type=int, default=1, help="testing batch size")
parser.add_argument("--n_views", type=int, default=5, help="num of view")
# default=None is a presence sentinel (resolve_img_wh falls back to the
# reference's [640, 480], eval.py:31) so an explicitly passed flag can
# be told apart from the default even when their values coincide.
parser.add_argument("--img_wh", nargs="+", type=int, default=None,
                    help="height and width of the image")
parser.add_argument("--loadckpt", default=None, help="load a specific checkpoint")
parser.add_argument("--outdir", default="./outputs", help="output dir")
parser.add_argument("--display", action="store_true", help="display depth images and masks")
parser.add_argument("--iteration", type=int, default=4, help="num of iteration of GRU")
parser.add_argument("--precision", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute precision: float32 = reference parity; "
                         "bfloat16 = TPU MXU fast path (heads stay float32)")
parser.add_argument("--debug_nans", action="store_true",
                    help="abort with a traceback on the first NaN produced "
                         "on device (jax_debug_nans)")
parser.add_argument("--feature_cache", default="auto",
                    choices=["auto", "on", "off"],
                    help="cache FeatureNet outputs per (scan, view) across "
                         "reference views: each image's features are computed "
                         "once per scan instead of once per pair that uses it "
                         "(~1.2 instead of n_views extractions per map). "
                         "auto = on for single-device batch-1 eval")
parser.add_argument("--feature_cache_views", type=int, default=16,
                    help="LRU capacity (views) of the feature cache")
parser.add_argument("--input_uint8", action="store_true",
                    help="upload level_0 images as raw uint8 and normalize "
                         "to [-1,1] on device (bit-identical math, 4x fewer "
                         "host->device bytes; exact when images are already "
                         "at the eval size — else the resize runs in uint8, "
                         "±0.5/255 vs the float32 path)")
parser.add_argument("--result_wire", default="uint16",
                    choices=["uint16", "float32"],
                    help="device->host transport for depth/confidence maps: "
                         "uint16 quantizes each map against its own range on "
                         "device (half the fetched bytes; error bounded by "
                         "depth span/131070 ~ 0.004 mm at DTU ranges and "
                         "8e-6 confidence — orders of magnitude under every "
                         "fusion/scoring threshold), float32 fetches raw "
                         "model outputs")
parser.add_argument("--scan_shard", default=None, metavar="I/N",
                    help="process only every N-th scan starting at I "
                         "(0-based), e.g. 0/4 .. 3/4: scan-level "
                         "parallelism across independent eval processes "
                         "(one per host/chip). Each process writes its "
                         "own scans' depth maps and fused PLYs, so N "
                         "processes scale scan throughput ~linearly — "
                         "and, unlike batched DP, each keeps the "
                         "feature cache and per-chip batch-1 fast path")
parser.add_argument("--geo_pixel_thres", type=float, default=1,
                    help="pixel threshold for geometric consistency filtering")
parser.add_argument("--geo_depth_thres", type=float, default=0.01,
                    help="depth threshold for geometric consistency filtering")
parser.add_argument("--photo_thres", type=float, default=0.3,
                    help="threshold for photometric consistency filtering")

TANKS_INTERMEDIATE_THRES = {"Family": 5, "Francis": 6, "Horse": 5, "Lighthouse": 6,
                            "M60": 5, "Panther": 5, "Playground": 5, "Train": 5}
TANKS_ADVANCED_THRES = {"Auditorium": 3, "Ballroom": 4, "Courtroom": 4,
                        "Museum": 4, "Palace": 5, "Temple": 4}
ETH3D_TEST_THRES = {"botanical_garden": 1, "boulders": 1, "bridge": 2, "door": 2,
                    "exhibition_hall": 2, "lecture_room": 2, "living_room": 2,
                    "lounge": 1, "observatory": 2, "old_computer": 2, "statue": 2,
                    "terrace_2": 2}
ETH3D_TRAIN_THRES = {"courtyard": 1, "delivery_area": 2, "electro": 1, "facade": 2,
                     "kicker": 1, "meadow": 1, "office": 1, "pipes": 1,
                     "playground": 1, "relief": 1, "relief_2": 1, "terrace": 1,
                     "terrains": 2}


def resolve_img_wh(args):
    # Env-var escape hatch (the named datasets pin their published eval
    # sizes below, mirroring the reference eval.py:47-50): lets tests
    # and sizing experiments run the same code path at a smaller
    # resolution without breaking flag parity.
    override = os.environ.get("ITERMVS_IMG_WH")
    # On the datasets that honor --img_wh (custom), an explicitly
    # passed flag beats a (possibly stale) env var; for the named
    # datasets the env var replaces the pinned published sizes.
    explicit_wh = args.img_wh is not None and args.dataset == "custom"
    if args.img_wh is None:
        args.img_wh = [640, 480]
    if override and not explicit_wh:
        try:
            w, h = (int(x) for x in override.lower().replace("x", " ").split())
        except (ValueError, TypeError):
            raise SystemExit(
                f"ITERMVS_IMG_WH must be 'W H' or 'WxH', got {override!r}")
        print(f"img_wh overridden via ITERMVS_IMG_WH: {w}x{h}")
        return (w, h)
    if args.dataset == "dtu_yao_eval":
        return (1600, 1152)
    if args.dataset == "tanks":
        return (1920, 1024)
    if args.dataset == "eth3d":
        return (1920, 1280)
    return (args.img_wh[0], args.img_wh[1])


def parse_scan_shard(spec):
    """'I/N' → (I, N), validated."""
    if spec is None:
        return None
    try:
        idx, count = (int(p) for p in spec.split("/"))
    except ValueError:
        raise SystemExit(f"--scan_shard must be I/N, got {spec!r}")
    if count < 1 or not 0 <= idx < count:
        raise SystemExit(f"--scan_shard needs 0 <= I < N, got {spec!r}")
    return idx, count


def shard_scans(scans, shard):
    """Deterministic round-robin slice of an ordered scan list."""
    if shard is None:
        return list(scans)
    idx, count = shard
    return list(scans)[idx::count]


def apply_scan_shard(dataset, shard):
    """Filter a dataset's metas to this shard's scans, in place.

    Scan-keyed eval datasets (dtu_yao_eval/tanks/eth3d/blendedmvs) carry
    the scan as metas[i][0]; round-robin over the first-appearance scan
    order. Single-scan datasets (custom) run wholly on shard 0.
    """
    if shard is None:
        return dataset
    metas = dataset.metas
    scan_keyed = bool(metas) and isinstance(metas[0][0], str)
    if not scan_keyed:
        if shard[0] != 0:
            dataset.metas = []
        return dataset
    order = list(dict.fromkeys(m[0] for m in metas))
    keep = set(shard_scans(order, shard))
    dataset.metas = [m for m in metas if m[0] in keep]
    return dataset


def build_dataset(args, img_wh):
    MVSDataset = find_dataset_def(args.dataset)
    u8 = bool(getattr(args, "input_uint8", False))
    if args.dataset == "dtu_yao_eval":
        return MVSDataset(args.testpath, args.testlist, args.n_views, img_wh,
                          uint8_level0=u8)
    if args.dataset == "tanks":
        return MVSDataset(args.testpath, args.n_views, img_wh, args.split,
                          uint8_level0=u8)
    if args.dataset == "eth3d":
        return MVSDataset(args.testpath, args.split, args.n_views, img_wh,
                          uint8_level0=u8)
    return MVSDataset(args.testpath, args.n_views, img_wh, uint8_level0=u8)


def quantize_results(depths, confs):
    """uint16 result wire, device side (jit this): [B,H,W,1] f32 depth +
    confidence → (depth_q uint16, lo [B], hi [B], conf_q uint16).

    Each depth map is quantized against its OWN [min, max] range;
    confidence is sigmoid output in [0,1] so it uses the fixed 1/65535
    grid. Halves the device→host fetch — the end-to-end eval bottleneck
    on slow-link hosts (docs/PERFORMANCE.md "eval.py end to end") — with
    round-to-nearest error ≤ span/131070 (~0.004 mm at DTU depth ranges,
    two orders of magnitude under the 1 px / 1% geometric consistency
    thresholds, reference eval.py:194-209) and ≤ 7.7e-6 confidence error
    vs the 0.3 photometric threshold. Same scheme as fusion.py's wire.
    """
    d = depths[..., 0]
    c = confs[..., 0]
    lo = jnp.min(d, axis=(1, 2))
    hi = jnp.max(d, axis=(1, 2))
    span = jnp.maximum(hi - lo, 1e-6)[:, None, None]
    depth_q = jnp.clip(jnp.round((d - lo[:, None, None]) * (65535.0 / span)),
                       0, 65535).astype(jnp.uint16)
    conf_q = jnp.clip(jnp.round(c * 65535.0), 0, 65535).astype(jnp.uint16)
    return depth_q, lo, hi, conf_q


def dequantize_results(depth_q, lo, hi, conf_q):
    """Host-side inverse of `quantize_results` (NumPy, float32)."""
    step = ((hi - lo).astype(np.float32) / np.float32(65535.0))[:, None, None]
    depths = (lo.astype(np.float32)[:, None, None]
              + depth_q.astype(np.float32) * step)
    confs = conf_q.astype(np.float32) / np.float32(65535.0)
    return depths, confs


def _write_outputs(outdir, filename, depth_est, confidence):
    depth_path = os.path.join(outdir, filename.format("depth_est", ".pfm"))
    conf_path = os.path.join(outdir, filename.format("confidence", ".pfm"))
    os.makedirs(os.path.dirname(depth_path), exist_ok=True)
    os.makedirs(os.path.dirname(conf_path), exist_ok=True)
    save_pfm(depth_path, depth_est.astype(np.float32))
    save_pfm(conf_path, confidence.astype(np.float32))


def save_depth(args, img_wh):
    dataset = apply_scan_shard(build_dataset(args, img_wh),
                               parse_scan_shard(args.scan_shard))
    # Decode in worker processes on multi-core hosts (the image decode +
    # pyramid resize is CPU-bound; threads only overlap IO waits — see
    # data/loader.py). 1-core hosts keep the thread pool.
    ncpu = os.cpu_count() or 1
    loader = DataLoader(dataset, args.batch_size, shuffle=False, num_workers=4,
                        drop_last=False,
                        worker_processes=min(4, ncpu - 1) if ncpu > 1 else 0)

    model = Pipeline(iteration=args.iteration, test=True,
                     dtype=jnp.dtype(args.precision))
    print(f"loading model {args.loadckpt}")
    variables = load_variables(args.loadckpt)

    # Data-parallel inference over ICI when the batch divides the device
    # count (the TPU-native analogue of the reference's DataParallel
    # eval wrap, eval.py:119): batch sharded, params replicated.
    mesh = None
    if jax.device_count() > 1 and args.batch_size % jax.device_count() == 0:
        from itermvs_tpu.parallel.mesh import batch_sharding, make_mesh, replicate

        mesh = make_mesh()
        print(f"data-parallel eval over {jax.device_count()} devices")

    def _forward(imgs, projs, dmin, dmax):
        out = model.apply(variables, imgs, projs, dmin, dmax)
        return out["depths_upsampled"], out["confidence_upsampled"]

    if mesh is None:
        forward = jax.jit(_forward)
    else:
        sharding = batch_sharding(mesh)
        variables = jax.device_put(variables, replicate(mesh))
        forward = jax.jit(_forward, in_shardings=(sharding,) * 4)

    def _pad(x, n):
        """Repeat the last batch element so partial final batches still
        shard evenly over the mesh; padded outputs are discarded."""
        return np.concatenate([x, np.repeat(x[-1:], n, axis=0)], axis=0)

    # Scan-level feature cache (single-device batch-1 eval): FeatureNet
    # runs once per (scan, view) instead of once per pair membership —
    # on DTU pair topology ~1.2 extractions/map instead of n_views —
    # and only new views' images are uploaded to the device. Outputs
    # are identical to the uncached forward: eval-mode BN uses running
    # stats, so features do not depend on what shares the batch.
    use_cache = (args.feature_cache == "on"
                 or (args.feature_cache == "auto"
                     and args.batch_size == 1 and mesh is None))
    if args.feature_cache == "on" and (args.batch_size != 1 or mesh is not None):
        raise SystemExit("--feature_cache on requires --batch_size 1 "
                         "on a single device")
    if use_cache:
        from collections import OrderedDict

        from itermvs_tpu.models.pipeline import cached_path_jits

        # Corner-packed gather tables are a pure function of a view's
        # features, reused by every map the view serves as a source —
        # pack ONCE per (scan, view) here instead of per map inside
        # match (rebuilding ~100 MB of identical tables per map at DTU
        # eval resolution). IterMVS accepts the pre-packed sources
        # as-is (models/itermvs.py:_pack).
        extract, prepack, match = cached_path_jits(model, variables)
        feature_cache: OrderedDict = OrderedDict()

        def forward_cached(sample, projs, dmin, dmax):
            scan = sample.get("scan", ["?"])[0]
            vids = np.asarray(sample["view_ids"][0])
            level0 = sample["imgs"]["level_0"]          # [1, V, H, W, 3]
            raw_ref = None
            packed_srcs = []
            for i, vid in enumerate(vids):
                key = (scan, int(vid))
                if key not in feature_cache:
                    fea = extract(jnp.asarray(level0[:, i]))
                    feature_cache[key] = (fea, prepack(fea))
                    while len(feature_cache) > args.feature_cache_views:
                        feature_cache.popitem(last=False)
                else:
                    feature_cache.move_to_end(key)
                raw, packed = feature_cache[key]
                if i == 0:
                    raw_ref = raw
                else:
                    packed_srcs.append(packed)
            # Per-view list form: match consumes per-view sources
            # directly, no stack/re-slice HBM round trip.
            out = match((raw_ref, *packed_srcs), projs, dmin, dmax)
            return out["depths_upsampled"], out["confidence_upsampled"]

    writer_pool = ThreadPoolExecutor(max_workers=2)
    write_futures = []
    to_wire = (jax.jit(quantize_results)
               if args.result_wire == "uint16" else None)

    def dispatch(sample):
        """Host→device upload + async forward launch for one batch."""
        n_real = len(sample["filename"])
        pad = args.batch_size - n_real if mesh is not None else 0
        # Upload only what the model reads (pipeline.py: level_0 images,
        # level_1..3 projections) — ~25% less host→device traffic/batch.
        projs = {k: jnp.asarray(_pad(v, pad) if pad else v)
                 for k, v in sample["proj_matrices"].items() if k != "level_0"}
        dmin = jnp.asarray(_pad(sample["depth_min"], pad) if pad
                           else sample["depth_min"])
        dmax = jnp.asarray(_pad(sample["depth_max"], pad) if pad
                           else sample["depth_max"])
        if use_cache and "view_ids" in sample:
            depths, confs = forward_cached(sample, projs, dmin, dmax)
        else:
            imgs = {k: jnp.asarray(_pad(v, pad) if pad else v)
                    for k, v in sample["imgs"].items() if k == "level_0"}
            depths, confs = forward(imgs, projs, dmin, dmax)
        wire = to_wire(depths, confs) if to_wire else (depths, confs)
        # Start the device→host copies NOW (they run as soon as the
        # async computation finishes, overlapping the next batch's host
        # work) instead of paying one blocking round trip per array at
        # finalize time — on tunnel transports each sync costs ~26 ms.
        for x in wire:
            try:
                x.copy_to_host_async()
            except AttributeError:
                pass
        return sample, n_real, wire

    batch_secs = []

    def finalize(batch_idx, start, sample, n_real, wire):
        """Device→host fetch + PFM writer handoff for one batch."""
        if to_wire:
            depth_q, lo, hi, conf_q = (np.asarray(x)[:n_real] for x in wire)
            depths, confs = dequantize_results(depth_q, lo, hi, conf_q)
        else:
            depths, confs = wire
            depths = np.asarray(depths)[:n_real, ..., 0]
            confs = np.asarray(confs)[:n_real, ..., 0]
        batch_secs.append(time.time() - start)
        print(f"Iter {batch_idx}/{total}, time = {batch_secs[-1]:.3f}")

        # PFM writes overlap the next batch's forward (device compute
        # continues while the writer thread drains).
        for filename, depth_est, confidence in zip(sample["filename"], depths, confs):
            write_futures.append(
                writer_pool.submit(_write_outputs, args.outdir, filename,
                                   depth_est, confidence))

    # One-batch software pipeline: batch i+1's upload + forward are
    # dispatched BEFORE batch i's results are fetched, so the device
    # computes through the fetch + PFM handoff instead of idling on the
    # host between batches (same scheme as fusion.py's dispatch/fetch).
    total = len(loader)
    pending = None
    start = time.time()
    for batch_idx, sample in enumerate(loader):
        launched = dispatch(sample)
        if pending is not None:
            finalize(batch_idx - 1, start, *pending)
        start = time.time()
        pending = launched
    if pending is not None:
        finalize(total - 1, start, *pending)

    # All PFMs must be on disk before fusion reads them back; surface any
    # write failure (disk full, bad path) with its real traceback instead
    # of a missing-file error later in fusion.
    writer_pool.shutdown(wait=True)
    for fut in write_futures:
        fut.result()
    # Per-batch wall times (first entry includes compile/first dispatch);
    # the CLI ignores this — bench.py records a steady-state rate from it.
    return batch_secs


def run_fusion(args, img_wh):
    timings = []
    shard = parse_scan_shard(args.scan_shard)
    if args.dataset == "dtu_yao_eval":
        with open(args.testlist) as f:
            scans = [line.rstrip() for line in f if line.strip()]
        for scan in shard_scans(scans, shard):
            scan_id = int(scan[4:])
            _, secs = filter_depth(
                os.path.join(args.testpath, scan),
                os.path.join(args.outdir, scan),
                os.path.join(args.outdir, f"itermvs{scan_id:0>3}_l3.ply"),
                args.geo_pixel_thres, args.geo_depth_thres,
                args.photo_thres, img_wh, 4, display=args.display)
            timings.append((scan, secs))
    elif args.dataset == "tanks":
        thres = (TANKS_INTERMEDIATE_THRES if args.split == "intermediate"
                 else TANKS_ADVANCED_THRES)
        for scan, gm in shard_scans(thres.items(), shard):
            _, secs = filter_depth(
                os.path.join(args.testpath, args.split, scan),
                os.path.join(args.outdir, scan),
                os.path.join(args.outdir, scan + ".ply"),
                args.geo_pixel_thres, args.geo_depth_thres,
                args.photo_thres, img_wh, gm, display=args.display)
            timings.append((scan, secs))
    elif args.dataset == "eth3d":
        thres = ETH3D_TEST_THRES if args.split == "test" else ETH3D_TRAIN_THRES
        for scan, gm in shard_scans(thres.items(), shard):
            _, secs = filter_depth(
                os.path.join(args.testpath, scan),
                os.path.join(args.outdir, scan),
                os.path.join(args.outdir, scan + ".ply"),
                args.geo_pixel_thres, args.geo_depth_thres,
                args.photo_thres, img_wh, gm, display=args.display)
            print(f"scan: {scan} time = {secs:3f}")
            timings.append((scan, secs))
    elif shard is None or shard[0] == 0:
        # Single-scan custom dataset: the whole scan belongs to shard 0.
        _, secs = filter_depth(
            args.testpath, args.outdir,
            os.path.join(args.outdir, "custom.ply"),
            args.geo_pixel_thres, args.geo_depth_thres,
            args.photo_thres, img_wh, geo_mask_thres=3, display=args.display)
        timings.append(("custom", secs))
    if timings:
        mean = sum(s for _, s in timings) / len(timings)
        print(f"fusion: {len(timings)} scan(s), mean {mean:.2f} sec/scene")


if __name__ == "__main__":
    args = parser.parse_args()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    print("argv:", sys.argv[1:])
    for k, v in sorted(vars(args).items()):
        print(f"{k}: {v}")
    img_wh = resolve_img_wh(args)
    save_depth(args, img_wh)
    run_fusion(args, img_wh)
