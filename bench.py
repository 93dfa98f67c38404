"""Benchmark: the three north-star metrics, one JSON line.

Primary metric (BASELINE.json): DTU depth-map inference throughput per
chip at the paper's eval resolution 1152×864, N=5 views, iteration=4,
bfloat16 compute — the monolithic test-mode forward (all V feature maps
recomputed per reference view, like the reference eval loop). bf16
depth maps are quality-equivalent to float32 (see tools/bf16_check.py);
float32 remains eval.py's default precision and is parity-tested
against the torch reference in tests (median relative depth error
< 1e-3, tests/test_model_parity.py).

`extra` carries the remaining north stars measured in the same run:
  * feature-cached maps/sec (eval.py's default pipeline: per-(scan,view)
    LRU of features + pre-packed gather tables, ~1 new view per map on
    DTU pair topology) at 1152×864 and 1600×1152;
  * maps/sec at the repo's own DTU eval resolution 1600×1152
    (reference eval.py:47);
  * fusion sec/scene: itermvs_tpu.fusion.filter_depth on a synthetic
    7-view scan at 1600×1152 (depths predicted by the model at N=5,
    reusing the throughput stage's compiled program; fusion fuses the
    full 7-view pair topology), ONE run timed exactly as it executes
    here — compile/caches included, no "clean window" assumptions. Baseline 179.6 s/scene is the
    reference's NumPy/cv2 fusion loop (eval.py:212-309) incl. the same
    mask/PLY output flow, measured on this host on the identical scan
    (tools/bench_reference_fusion.py);
  * end-to-end quality: DTU-protocol scorer (acc/comp/overall,
    benchmark/dtu_score.py) on the fused clouds against analytic GT —
    a plane scan (rounds-1..3 continuity metric) plus, budget
    permitting, a sphere+step scan with real occlusion, aggregated
    ComputeStat_web.m-style. NN queries are subsampled (query_cap) —
    an unbiased estimate of the same per-point-mean metric, sized for
    this single-core host.

Budget guard: the whole run targets ITERMVS_BENCH_BUDGET seconds
(default 600). Optional stages are skipped when the remaining budget
can't cover their estimated cost (recorded as `<stage>_skipped`), a
SIGALRM fires shortly before the budget to flush the JSON line, and a
SIGTERM handler does the same if an external timeout fires first.
Exactly ONE JSON line is printed either way.

Weights: the released DTU checkpoint — the vendored conversion under
checkpoints/dtu/model_000015.npz, falling back to the reference mount's
torch pickle — else random init (throughput-identical; quality metric
then skipped).

Throughput baseline: the IterMVS paper (arXiv 2112.05126, Tab. 4)
reports 0.17 s per view at 1152×864 on an RTX 2080Ti — 5.88 maps/sec.
`vs_baseline` is our maps/sec divided by that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
from __future__ import annotations

import json
import os
import shutil
import signal
import tempfile
import time

import numpy as np

BASELINE_MAPS_PER_SEC = 1.0 / 0.17
# Reference fusion (NumPy + cv2.remap, eval.py:212-309) on the same
# synthetic 7-view 1600x1152 scan, this host, including the full output
# flow (mask PNGs, back-projection, PLY) like our timing does
# (tools/bench_reference_fusion.py, measured 2026-08-17: 179.6 s/scene).
BASELINE_FUSION_SEC_PER_SCENE = 179.6
BASELINE_DTU_OVERALL_MM = 0.363

BUDGET_SEC = float(os.environ.get("ITERMVS_BENCH_BUDGET", "900"))
_START = time.monotonic()
_DEADLINE = _START + BUDGET_SEC

# The one JSON line, updated in place after every stage and printed
# exactly once — at normal completion, or early from a signal handler.
RESULT = {
    "metric": "DTU depth maps/sec/chip (1152x864, N=5, iter=4, bf16)",
    "value": None,
    "unit": "maps/sec",
    "vs_baseline": None,
    "extra": {},
}
_EMITTED = False


def _emit_and_exit(signum, frame):  # pragma: no cover - signal path
    global _EMITTED
    if not _EMITTED:
        _EMITTED = True
        RESULT["extra"]["terminated_by"] = (
            "budget_alarm" if signum == signal.SIGALRM else f"signal_{signum}")
        RESULT["extra"]["elapsed_sec"] = round(time.monotonic() - _START, 1)
        print(json.dumps(RESULT), flush=True)
    os._exit(0)


def _remaining() -> float:
    return _DEADLINE - time.monotonic()


def _bench_inputs(batch, views, height, width):
    """Example inputs in the exact form eval.py uploads per map:
    imgs = {"level_0": uint8} (the model consumes only level_0 and
    normalizes uint8 on device, models/pipeline.py:_normalize); levels
    1-3 images are never uploaded by the eval driver."""
    import jax.numpy as jnp
    from __graft_entry__ import _example_inputs

    imgs, projs, dmin, dmax = _example_inputs(batch, views, height, width)
    u8 = np.clip((np.asarray(imgs["level_0"]) + 1.0) * 127.5, 0, 255)
    return ({"level_0": jnp.asarray(np.round(u8).astype(np.uint8))},
            projs, dmin, dmax)


def _throughput(forward, width, height, views, iters=12):
    import jax

    imgs, projs, dmin, dmax = _bench_inputs(1, views, height, width)
    d, c = forward(imgs, projs, dmin, dmax)   # warmup / compile
    jax.block_until_ready((d, c))
    start = time.perf_counter()
    for _ in range(iters):
        d, c = forward(imgs, projs, dmin, dmax)
    jax.block_until_ready((d, c))
    return iters / (time.perf_counter() - start)


def _throughput_cached(model, variables, width, height, views, iters=12):
    """Steady-state maps/sec of the feature-cached eval pipeline.

    Models the eval.py feature-cache inner loop on scan topology where
    each new reference view introduces ~one unseen source image (DTU
    pair lists are neighborhood-local): per map, ONE batch-1 FeatureNet
    extraction + table pre-pack + match. The uncached forward instead
    recomputes all `views` feature maps per map.
    """
    import jax
    from itermvs_tpu.models.pipeline import cached_path_jits

    imgs, projs, dmin, dmax = _bench_inputs(1, views, height, width)
    extract, prepack, match = cached_path_jits(model, variables)
    img0 = imgs["level_0"][:, 0]

    def extract_packed():
        fea = extract(img0)
        return fea, prepack(fea)

    cache = [extract_packed() for _ in range(views)]

    def one_map():
        cache.pop(0)
        cache.append(extract_packed())       # the ~1 new view per map
        out = match((cache[0][0], *(p for _, p in cache[1:])),
                    projs, dmin, dmax)
        return out["depths_upsampled"], out["confidence_upsampled"]

    jax.block_until_ready(one_map())
    start = time.perf_counter()
    for _ in range(iters):
        out = one_map()
    jax.block_until_ready(out)
    return iters / (time.perf_counter() - start)


def _predict_and_fuse(forward, root, views, width, height, n_views=5):
    """Predict depths for every ref view of the scan at `root` (model
    forward at `n_views`), write PFMs, run fusion. Returns (ply_path,
    fusion_secs). Fusion always runs over the scan's full pair topology
    (`views` source views per ref, read from pair.txt), so the fusion
    timing is a true `views`-view measurement regardless of n_views."""
    import jax.numpy as jnp
    from itermvs_tpu.fusion import filter_depth
    from itermvs_tpu.io import save_pfm
    from itermvs_tpu.data import find_dataset_def

    ds = find_dataset_def("custom")(root, n_views=n_views,
                                    img_wh=(width, height),
                                    uint8_level0=True)
    os.makedirs(os.path.join(root, "depth_est"), exist_ok=True)
    os.makedirs(os.path.join(root, "confidence"), exist_ok=True)
    for i in range(len(ds)):
        s = ds[i]
        d, c = forward(
            {"level_0": jnp.asarray(s["imgs"]["level_0"])[None]},
            {k: jnp.asarray(v)[None] for k, v in s["proj_matrices"].items()},
            jnp.asarray([s["depth_min"]]), jnp.asarray([s["depth_max"]]))
        save_pfm(os.path.join(root, f"depth_est/{i:08d}.pfm"),
                 np.asarray(d)[0, ..., 0].astype(np.float32))
        save_pfm(os.path.join(root, f"confidence/{i:08d}.pfm"),
                 np.asarray(c)[0, ..., 0].astype(np.float32))

    ply = os.path.join(root, "fused.ply")
    # ONE run, timed as-is: this is exactly the cost a user pays per
    # scan in this process state (kernel compiles amortize across a
    # 22-scan DTU eval but are honestly part of a cold start; see
    # docs/PERFORMANCE.md "Fusion host tail" for the breakdown).
    _, fusion_secs = filter_depth(root, root, ply, 1.0, 0.01, 0.3,
                                  (width, height), geo_mask_thres=3,
                                  verbose=False)
    return ply, fusion_secs


def _run_scene(forward, scene, views, width, height, n_views=5):
    """One synthetic scan: build scene → model depths → PFMs →
    filter_depth → fused PLY. Returns (root_dir, ply_path, cams,
    analytic depths, fusion_secs). Caller owns/removes root_dir."""
    from tests.synthetic_scene import build_scene_dir

    root = tempfile.mkdtemp(prefix="itermvs_bench_")
    cams, depths = build_scene_dir(root, num_views=views, width=width,
                                   height=height, write_gt_depth=False,
                                   scene=scene)
    ply, fusion_secs = _predict_and_fuse(forward, root, views, width,
                                         height, n_views)
    return root, ply, cams, depths, fusion_secs


def _clone_scene(root):
    """Second scan dir sharing the same rendered inputs via symlinks
    (so a second prediction path can be fused + scored on the identical
    scene without re-rendering)."""
    clone = tempfile.mkdtemp(prefix="itermvs_bench_")
    for name in ("images", "cams_1", "pair.txt"):
        os.symlink(os.path.join(root, name), os.path.join(clone, name))
    return clone


def _cached_forward_fn(model, variables):
    """Per-map forward through the feature-cached compute path
    (batch-1 extract → pre-packed gather tables → match) — the exact
    kernels eval.py's default pipeline runs. LRU reuse across maps
    cannot change values (features are a pure per-view function), so
    this is the right subject for the cached-path quality canary."""
    from itermvs_tpu.models.pipeline import cached_path_jits

    extract, prepack, match = cached_path_jits(model, variables)

    def forward(imgs, projs, dmin, dmax):
        level0 = imgs["level_0"]                       # [1, V, H, W, 3]
        views = level0.shape[1]
        ref = extract(level0[:, 0])
        srcs = [prepack(extract(level0[:, v])) for v in range(1, views)]
        out = match((ref, *srcs), projs, dmin, dmax)
        return out["depths_upsampled"], out["confidence_upsampled"]

    return forward


def _eval_e2e(ckpt, width=1152, height=864, views=10, n_views=5):
    """maps/sec of the REAL eval.py save_depth loop (loader + feature
    cache + software pipeline + PFM writers) on a synthetic scan.

    First pass warms the jit/compile caches (eval.py builds its own jit
    closures; the persistent compile cache makes that cheap), the
    second pass is timed end-to-end. Returns (whole-pass rate incl.
    model load + first dispatch, steady rate over batches 1..n). On
    this tunnel-attached rig the steady rate is DOWNLOAD-bound, not
    compute-bound: each map fetches ~8 MB of f32 depth+confidence over
    a ~35 MB/s tunnel download path plus ~26 ms dispatch RTTs (see
    docs/PERFORMANCE.md "Eval e2e over the tunnel"); on a PCIe-attached
    TPU host the fetch is sub-ms and the loop approaches the modeled
    cached rate."""
    import eval as eval_mod
    from tests.synthetic_scene import build_scene_dir

    root = tempfile.mkdtemp(prefix="itermvs_bench_e2e_")
    try:
        build_scene_dir(root, num_views=views, width=width, height=height,
                        write_gt_depth=False)
        from itermvs_tpu.data.base import clear_decode_cache

        out = {}
        steady = None
        for attempt in ("warm", "timed"):
            # Start each pass decode-cold: the warm pass exists to warm
            # the jit/compile caches, but it also fills the process-wide
            # decode LRU (data/base.py) — left in place, the timed pass
            # would serve every pyramid from memory and overstate the
            # rate a real first-scan eval (which decodes as it goes,
            # with LRU reuse only WITHIN the scan) actually gets.
            clear_decode_cache()
            outdir = os.path.join(root, f"out_{attempt}")
            argv = ["--dataset=custom", "--batch_size=1",
                    "--n_views", str(n_views), f"--testpath={root}",
                    f"--outdir={outdir}", "--precision", "bfloat16",
                    "--img_wh", str(width), str(height),
                    "--loadckpt", ckpt]
            args = eval_mod.parser.parse_args(argv)
            t0 = time.perf_counter()
            batch_secs = eval_mod.save_depth(args, (width, height))
            out[attempt] = views / (time.perf_counter() - t0)
            if len(batch_secs) > 1:
                steady = (len(batch_secs) - 1) / sum(batch_secs[1:])
        return out["timed"], steady
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _gather_roofline():
    """ns/row of the dominant L1 iteration gather at 1152×864 under
    real sweep indices vs the sequential (streaming) ceiling and the
    random floor — live evidence for the gather-floor claim
    (tools/exp_roofline.py is the full-suite version)."""
    from tools.exp_roofline import _real_indices, probe

    rows_t, lanes = 248832, 64
    real = _real_indices(1, 1152, 864, view=1)
    rng = np.random.RandomState(1)
    out = {}
    for reg, idx in (("real", real),
                     ("seq", (np.arange(real.shape[0]) % rows_t)),
                     ("rand", rng.randint(0, rows_t, real.shape[0]))):
        out[reg] = round(probe(f"bench L1 {reg}", rows_t, lanes,
                               idx.astype(np.int32), iters=8), 3)
    return out


def _footprint_fits():
    """Multi-sample footprint-sharing fit fractions on the bench's own
    synthetic geometry at 1600×1152 (see tools/exp_footprint.py): the
    measured reason shared-row gathers cannot engage exactly."""
    from tests.synthetic_scene import DEPTH_MAX, DEPTH_MIN, Z0, make_cameras
    from tools.exp_footprint import OFFSETS, IS, fits, level_proj

    cams = make_cameras(5, 1600, 1152, np.random.RandomState(0))
    h4, w4 = 1152 // 8, 1600 // 8      # stride-2 subsample of the 1/4 grid
    idmin, idmax = 1.0 / DEPTH_MIN, 1.0 / DEPTH_MAX
    nd = np.full((h4, w4), ((1.0 / Z0) - idmax) / (idmin - idmax))
    K, E_ref = cams[0]
    out = {}
    for level, groups in ((1, [("quad", (0, 1, 2, 3)), ("pair", (0, 1))]),
                          (2, [("pair", (0, 1))]),
                          (3, [("quad", (0, 1))])):
        offs = np.asarray(OFFSETS[level]) * IS
        s = np.clip(nd[None] + offs[:, None, None], 0.0, 1.0)
        depth_s = 1.0 / (idmax + s * (idmin - idmax))
        acc = {}
        for v in range(1, 5):
            px, py = level_proj(K, cams[v][1], E_ref, level, h4, w4, depth_s)
            for gname, g in groups:
                bx, by = np.floor(px[list(g)]), np.floor(py[list(g)])
                for k in (3, 5):
                    ok = (fits(bx.min(0), bx.max(0), k)
                          & fits(by.min(0), by.max(0), k))
                    key = f"l{level}_{gname}_{k}x{k}"
                    acc[key] = acc.get(key, 0.0) + float(ok.mean()) / 4
        out.update({k: round(v, 4) for k, v in acc.items()})
    return out


QUERY_CAP = 600_000   # NN-query subsample per direction (see dtu_score)


def _score_plane(root, ply):
    from tests.synthetic_scene import Z0
    from itermvs_tpu.io import read_ply, write_ply
    from itermvs_tpu.benchmark.dtu_score import score

    xyz, _ = read_ply(ply)
    lo = np.percentile(xyz[:, :2], 2, axis=0)
    hi = np.percentile(xyz[:, :2], 98, axis=0)
    gx, gy = np.meshgrid(np.arange(lo[0], hi[0], 0.02),
                         np.arange(lo[1], hi[1], 0.02))
    gt = np.stack([gx.ravel(), gy.ravel(),
                   np.full(gx.size, Z0)], axis=1).astype(np.float32)
    gt_ply = os.path.join(root, "gt_plane.ply")
    write_ply(gt_ply, gt, np.zeros_like(gt, dtype=np.uint8))
    return score(ply, gt_ply, density=0.02, max_dist=1.0,
                 query_cap=QUERY_CAP)


def _score_sphere(forward, views, width, height, roots):
    from tests.synthetic_scene import gt_point_cloud
    from itermvs_tpu.io import write_ply
    from itermvs_tpu.benchmark.dtu_score import score

    root2, ply2, cams2, depths2, fusion_secs = _run_scene(
        forward, "sphere_step", views, width, height)
    roots.append(root2)
    gt2 = gt_point_cloud(cams2, depths2, stride=2)
    gt2_ply = os.path.join(root2, "gt_sphere.ply")
    write_ply(gt2_ply, gt2, np.zeros_like(gt2, dtype=np.uint8))
    return score(ply2, gt2_ply, density=0.02, max_dist=1.0,
                 query_cap=QUERY_CAP), fusion_secs


def main():
    global _EMITTED
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGALRM, _emit_and_exit)
    # Flush the line ~15 s before the budget even if a stage is stuck in
    # a long C call (the alarm is then delivered when it returns).
    signal.alarm(max(int(BUDGET_SEC - 15), 30))

    import jax
    import jax.numpy as jnp
    from itermvs_tpu.models import Pipeline
    from itermvs_tpu.utils import enable_persistent_cache
    from __graft_entry__ import _example_inputs

    enable_persistent_cache()
    extra = RESULT["extra"]

    model = Pipeline(iteration=4, test=True, dtype=jnp.bfloat16)
    from itermvs_tpu.engine.checkpoint import load_variables, pretrained_path

    ckpt = pretrained_path("dtu")
    if ckpt is not None:
        variables = load_variables(ckpt)
        have_ckpt = True
    else:
        # Fully-convolutional model: parameters are resolution-independent,
        # so init at a tiny shape (skips a full-size init compile).
        imgs, projs, dmin, dmax = _example_inputs(1, 5, 96, 128)
        variables = model.init(jax.random.PRNGKey(0), imgs, projs, dmin, dmax)
        have_ckpt = False

    @jax.jit
    def forward(imgs, projs, dmin, dmax):
        out = model.apply(variables, imgs, projs, dmin, dmax)
        return out["depths_upsampled"], out["confidence_upsampled"]

    def stage(name, est_sec, fn):
        """Run an optional stage if the remaining budget covers it."""
        if _remaining() < est_sec:
            extra[f"{name}_skipped"] = "budget"
            return None
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — reported, not swallowed
            extra[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
            return None

    # ---- Primary: monolithic forward at the paper's resolution. ----
    maps_paper = _throughput(forward, 1152, 864, views=5)
    RESULT["value"] = round(maps_paper, 3)
    RESULT["vs_baseline"] = round(maps_paper / BASELINE_MAPS_PER_SEC, 3)

    # ---- Secondary throughputs, cheapest (and most informative) first.
    cached_paper = stage(
        "cached_1152x864", 60,
        lambda: _throughput_cached(model, variables, 1152, 864, 5))
    if cached_paper is not None:
        extra["maps_per_sec_1152x864_feature_cached"] = round(cached_paper, 3)
        extra["maps_per_sec_1152x864_feature_cached_vs_baseline"] = round(
            cached_paper / BASELINE_MAPS_PER_SEC, 3)

    maps_eval = stage(
        "eval_res_1600x1152", 90,
        lambda: _throughput(forward, 1600, 1152, views=5, iters=8))
    if maps_eval is not None:
        extra["maps_per_sec_1600x1152"] = round(maps_eval, 3)
        extra["maps_per_sec_1600x1152_vs_baseline"] = round(
            maps_eval / BASELINE_MAPS_PER_SEC, 3)

    cached_eval = stage(
        "cached_1600x1152", 90,
        lambda: _throughput_cached(model, variables, 1600, 1152, 5, iters=8))
    if cached_eval is not None:
        extra["maps_per_sec_1600x1152_feature_cached"] = round(cached_eval, 3)
        extra["maps_per_sec_1600x1152_feature_cached_vs_baseline"] = round(
            cached_eval / BASELINE_MAPS_PER_SEC, 3)

    # ---- Footprint-sharing overlap facts (pure NumPy; round-5
    # gather-floor evidence, see tools/exp_footprint.py). ----
    fits = stage("footprint", 20, _footprint_fits)
    if fits is not None:
        extra["footprint_window_fit"] = fits

    # ---- The REAL eval.py loop, end to end (loader + cache + PFMs).
    if have_ckpt:
        e2e = stage("eval_e2e", 200, lambda: _eval_e2e(ckpt))
        if e2e is not None:
            e2e_cold, e2e_steady = e2e
            extra["eval_e2e_maps_per_sec"] = round(e2e_cold, 3)
            extra["eval_e2e_maps_per_sec_vs_baseline"] = round(
                e2e_cold / BASELINE_MAPS_PER_SEC, 3)
            if e2e_steady is not None:
                extra["eval_e2e_steady_maps_per_sec"] = round(e2e_steady, 3)

    # ---- Fusion + quality on a full-size synthetic scan. ----
    roots = []
    try:
        plane = stage(
            "fusion", 150,
            lambda: _run_scene(forward, "plane", 7, 1600, 1152))
        if plane is not None:
            root, ply, _, _, fusion_secs = plane
            roots.append(root)
            # First fusion in this process: consistency-kernel compile
            # and cache warmup included (honest cold start).
            extra["fusion_sec_first_scene"] = round(fusion_secs, 3)
            extra["fusion_sec_per_scene_7view_1600x1152"] = round(
                fusion_secs, 3)
            extra["fusion_vs_reference_cpu"] = round(
                BASELINE_FUSION_SEC_PER_SCENE / fusion_secs, 2)

            if have_ckpt:
                plane_score = stage("plane_quality", 90,
                                    lambda: _score_plane(root, ply))
                if plane_score is not None:
                    extra["synthetic_scene_overall_mm"] = round(
                        float(plane_score["overall_mm"]), 5)

                # Cached-path quality canary: the feature-cached +
                # pre-packed pipeline (eval.py's default) fused + scored
                # on the SAME scene — the fastest path and the scored
                # path must not silently diverge. Its fusion run is also
                # the steady-state fusion sample (second fusion in this
                # process: kernels compiled, source depths cached).
                def _canary():
                    clone = _clone_scene(root)
                    roots.append(clone)
                    cached_fwd = _cached_forward_fn(model, variables)
                    ply2, secs2 = _predict_and_fuse(cached_fwd, clone, 7,
                                                    1600, 1152)
                    return _score_plane(clone, ply2), secs2

                canary = stage("cached_quality", 150, _canary)
                if canary is not None:
                    cscore, steady_secs = canary
                    extra["synthetic_scene_overall_mm_cached"] = round(
                        float(cscore["overall_mm"]), 5)
                    extra["fusion_sec_steady"] = round(steady_secs, 3)
                    extra["fusion_steady_vs_reference_cpu"] = round(
                        BASELINE_FUSION_SEC_PER_SCENE / steady_secs, 2)

                # Gather roofline (live): real-index rate vs streaming/
                # random ceilings at the dominant L1 shape (floor
                # evidence; full suite in tools/exp_roofline.py).
                roofline = stage("roofline", 90, _gather_roofline)
                if roofline is not None:
                    extra["gather_ns_per_row_l1"] = roofline

                sphere = stage(
                    "sphere_quality", 180,
                    lambda: _score_sphere(forward, 7, 1600, 1152, roots))
                if sphere is not None:
                    sphere_score, sphere_secs = sphere
                    extra["synthetic_sphere_overall_mm"] = round(
                        float(sphere_score["overall_mm"]), 5)
                    extra["fusion_sec_sphere_scene"] = round(sphere_secs, 3)
                    if plane_score is not None:
                        from itermvs_tpu.benchmark.dtu_score import aggregate

                        agg = aggregate([plane_score, sphere_score])
                        extra["synthetic_multi_scene_overall_mm"] = round(
                            float(agg["overall_mm"]), 5)
    finally:
        for r in roots:
            shutil.rmtree(r, ignore_errors=True)

    signal.alarm(0)
    extra["elapsed_sec"] = round(time.monotonic() - _START, 1)
    _EMITTED = True
    print(json.dumps(RESULT), flush=True)


if __name__ == "__main__":
    main()
