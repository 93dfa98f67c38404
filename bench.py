"""Benchmark: the three north-star metrics, one JSON line.

Primary metric (BASELINE.json): DTU depth-map inference throughput per
chip at the paper's eval resolution 1152×864, N=5 views, iteration=4,
bfloat16 compute — the production TPU path (convs/features/gather
tables bf16; geometry, 256-bin softmax, depth readout and heads
float32). bf16 depth maps are quality-equivalent to float32 (see
tools/bf16_check.py); float32 remains eval.py's default and is
bit-compared against the torch reference in tests.

`extra` carries the remaining north stars measured in the same run:
  * maps/sec at the repo's own DTU eval resolution 1600×1152
    (reference eval.py:47);
  * fusion sec/scene: itermvs_tpu.fusion.filter_depth on a synthetic
    7-view scan at 1600×1152 (depths predicted by the model), second
    run (first run pays kernel compiles). Baseline 179.6 s/scene is the
    reference's NumPy/cv2 fusion loop (eval.py:212-309) incl. the same
    mask/PLY output flow, measured on this host on the identical scan
    (tools/bench_reference_fusion.py);
  * end-to-end quality: DTU-protocol scorer (acc/comp/overall,
    benchmark/dtu_score.py) on fused clouds from TWO synthetic scans —
    a textured plane and a sphere+step scene with real occlusion —
    against their analytic GT, aggregated ComputeStat_web.m-style
    (dtu_score.aggregate): a synthetic stand-in for the 0.363 mm DTU
    overall (README.md:91-93) while the real DTU eval set isn't
    mountable.

Weights: the released DTU checkpoint when the reference mount is
present, else random init (throughput-identical; quality metric skipped).

Throughput baseline: the IterMVS paper (arXiv 2112.05126, Tab. 4)
reports 0.17 s per view at 1152×864 on an RTX 2080Ti — 5.88 maps/sec.
`vs_baseline` is our maps/sec divided by that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
from __future__ import annotations

import json
import os
import shutil
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

CKPT = "/root/reference/checkpoints/dtu/model_000015.ckpt"


def _throughput(forward, width, height, views, iters=12):
    import jax
    from __graft_entry__ import _example_inputs

    imgs, projs, dmin, dmax = _example_inputs(1, views, height, width)
    d, c = forward(imgs, projs, dmin, dmax)   # warmup / compile
    jax.block_until_ready((d, c))
    start = time.perf_counter()
    for _ in range(iters):
        d, c = forward(imgs, projs, dmin, dmax)
    jax.block_until_ready((d, c))
    return iters / (time.perf_counter() - start)


def _throughput_cached(model, variables, width, height, views, iters=12):
    """Steady-state maps/sec of the feature-cached eval pipeline.

    Models the eval.py --feature_cache inner loop on scan topology where
    each new reference view introduces ~one unseen source image (DTU
    pair lists are neighborhood-local): per map, ONE batch-1 FeatureNet
    extraction + feature stack + match. The uncached forward instead
    recomputes all `views` feature maps per map.
    """
    import jax
    import jax.numpy as jnp
    from itermvs_tpu.models import Pipeline
    from itermvs_tpu.ops.warping import pack_bilinear
    from __graft_entry__ import _example_inputs

    imgs, projs, dmin, dmax = _example_inputs(1, views, height, width)
    extract = jax.jit(lambda x: model.apply(variables, x,
                                            method=Pipeline.extract))
    prepack = jax.jit(lambda f: {k: pack_bilinear(v) for k, v in f.items()})
    match = jax.jit(lambda f, p, lo, hi: model.apply(
        variables, f, p, lo, hi, method=Pipeline.match))
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


def _run_scene(forward, scene, views, width, height, time_fusion):
    """One synthetic scan: model depths → PFMs → filter_depth → fused
    PLY. Returns (root_dir, ply_path, cams, analytic depths,
    fusion_secs or None). Caller owns/removes root_dir."""
    import jax.numpy as jnp
    from tests.synthetic_scene import build_scene_dir
    from itermvs_tpu.fusion import filter_depth
    from itermvs_tpu.io import save_pfm
    from itermvs_tpu.data import find_dataset_def

    root = tempfile.mkdtemp(prefix="itermvs_bench_")
    cams, depths = build_scene_dir(root, num_views=views, width=width,
                                   height=height, write_gt_depth=False,
                                   scene=scene)
    ds = find_dataset_def("custom")(root, n_views=views,
                                    img_wh=(width, height))
    os.makedirs(os.path.join(root, "depth_est"), exist_ok=True)
    os.makedirs(os.path.join(root, "confidence"), exist_ok=True)
    for i in range(len(ds)):
        s = ds[i]
        d, c = forward(
            {k: jnp.asarray(v)[None] for k, v in s["imgs"].items()},
            {k: jnp.asarray(v)[None] for k, v in s["proj_matrices"].items()},
            jnp.asarray([s["depth_min"]]), jnp.asarray([s["depth_max"]]))
        save_pfm(os.path.join(root, f"depth_est/{i:08d}.pfm"),
                 np.asarray(d)[0, ..., 0].astype(np.float32))
        save_pfm(os.path.join(root, f"confidence/{i:08d}.pfm"),
                 np.asarray(c)[0, ..., 0].astype(np.float32))

    ply = os.path.join(root, "fused.ply")
    _, fusion_secs = filter_depth(root, root, ply, 1.0, 0.01, 0.3,
                                  (width, height), geo_mask_thres=3,
                                  verbose=False)
    if time_fusion:
        # Second run is the timed one (first pays kernel compiles).
        _, fusion_secs = filter_depth(root, root, ply, 1.0, 0.01, 0.3,
                                      (width, height), geo_mask_thres=3,
                                      verbose=False)
    return root, ply, cams, depths, fusion_secs


def _fusion_and_quality(forward, have_ckpt, size=(1600, 1152), views=7):
    """Two synthetic 7-view scans at 1600×1152 through the full
    inference → fusion → DTU-protocol-scorer chain:

      * "plane" — fusion timing (2nd run) + overall vs the analytic
        plane (the round-1/2 continuity metric);
      * "sphere_step" — occlusion + curvature + depth discontinuity,
        scored vs the analytic visible-surface cloud (same shapes as
        the plane scan, so every compiled program is reused).

    Per-scan scores are combined by benchmark/dtu_score.py:aggregate —
    the ComputeStat_web.m mean-over-scans that produces the published
    DTU table numbers (reference evaluations/dtu/ComputeStat_web.m).

    Returns (fusion_secs, {plane, sphere_step, multi_scene} overall mm
    or None without the checkpoint — random weights score nothing).
    """
    from tests.synthetic_scene import Z0, gt_point_cloud
    from itermvs_tpu.io import read_ply, write_ply
    from itermvs_tpu.benchmark.dtu_score import score, aggregate

    width, height = size
    roots = []
    try:
        root, ply, cams, depths, fusion_secs = _run_scene(
            forward, "plane", views, width, height, time_fusion=True)
        roots.append(root)
        quality = None
        if have_ckpt:
            xyz, _ = read_ply(ply)
            lo = np.percentile(xyz[:, :2], 2, axis=0)
            hi = np.percentile(xyz[:, :2], 98, axis=0)
            gx, gy = np.meshgrid(np.arange(lo[0], hi[0], 0.02),
                                 np.arange(lo[1], hi[1], 0.02))
            gt = np.stack([gx.ravel(), gy.ravel(),
                           np.full(gx.size, Z0)], axis=1).astype(np.float32)
            gt_ply = os.path.join(root, "gt_plane.ply")
            write_ply(gt_ply, gt, np.zeros_like(gt, dtype=np.uint8))
            plane_score = score(ply, gt_ply, density=0.02, max_dist=1.0)

            root2, ply2, cams2, depths2, _ = _run_scene(
                forward, "sphere_step", views, width, height,
                time_fusion=False)
            roots.append(root2)
            gt2 = gt_point_cloud(cams2, depths2, stride=2)
            gt2_ply = os.path.join(root2, "gt_sphere.ply")
            write_ply(gt2_ply, gt2, np.zeros_like(gt2, dtype=np.uint8))
            sphere_score = score(ply2, gt2_ply, density=0.02, max_dist=1.0)

            agg = aggregate([plane_score, sphere_score])
            quality = {
                "plane": plane_score["overall_mm"],
                "sphere_step": sphere_score["overall_mm"],
                "multi_scene": agg["overall_mm"],
            }
        return fusion_secs, quality
    finally:
        for r in roots:
            shutil.rmtree(r, ignore_errors=True)


def main():
    import jax
    import jax.numpy as jnp
    from itermvs_tpu.models import Pipeline
    from itermvs_tpu.utils import enable_persistent_cache
    from __graft_entry__ import _example_inputs

    enable_persistent_cache()

    model = Pipeline(iteration=4, test=True, dtype=jnp.bfloat16)
    have_ckpt = os.path.exists(CKPT)
    if have_ckpt:
        from itermvs_tpu.engine.torch_import import import_torch_checkpoint

        variables = import_torch_checkpoint(CKPT)
    else:
        # Fully-convolutional model: parameters are resolution-independent,
        # so init at a tiny shape (skips a full-size init compile).
        imgs, projs, dmin, dmax = _example_inputs(1, 5, 96, 128)
        variables = model.init(jax.random.PRNGKey(0), imgs, projs, dmin, dmax)

    @jax.jit
    def forward(imgs, projs, dmin, dmax):
        out = model.apply(variables, imgs, projs, dmin, dmax)
        return out["depths_upsampled"], out["confidence_upsampled"]

    maps_paper = _throughput(forward, 1152, 864, views=5)
    maps_eval = _throughput(forward, 1600, 1152, views=5, iters=8)
    # The primary metric must come out even if a secondary stage dies
    # (transient device/host hiccups over a multi-minute run): record
    # the failure in `extra` instead of losing the whole line.
    extra = {
        "maps_per_sec_1600x1152": round(maps_eval, 3),
        "maps_per_sec_1600x1152_vs_baseline": round(
            maps_eval / BASELINE_MAPS_PER_SEC, 3),
    }

    def stage(name, fn):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — reported, not swallowed
            extra[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
            return None

    fq = stage("fusion", lambda: _fusion_and_quality(forward, have_ckpt))
    if fq is not None:
        fusion_secs, quality = fq
        extra["fusion_sec_per_scene_7view_1600x1152"] = round(fusion_secs, 3)
        extra["fusion_vs_reference_cpu"] = round(
            BASELINE_FUSION_SEC_PER_SCENE / fusion_secs, 2)
        if quality is not None:
            extra["synthetic_scene_overall_mm"] = round(
                float(quality["plane"]), 5)
            extra["synthetic_sphere_overall_mm"] = round(
                float(quality["sphere_step"]), 5)
            extra["synthetic_multi_scene_overall_mm"] = round(
                float(quality["multi_scene"]), 5)

    maps_paper_cached = stage(
        "cached_1152x864",
        lambda: _throughput_cached(model, variables, 1152, 864, 5))
    if maps_paper_cached is not None:
        extra["maps_per_sec_1152x864_feature_cached"] = round(
            maps_paper_cached, 3)
    maps_eval_cached = stage(
        "cached_1600x1152",
        lambda: _throughput_cached(model, variables, 1600, 1152, 5, iters=8))
    if maps_eval_cached is not None:
        extra["maps_per_sec_1600x1152_feature_cached"] = round(
            maps_eval_cached, 3)
        extra["maps_per_sec_1600x1152_feature_cached_vs_baseline"] = round(
            maps_eval_cached / BASELINE_MAPS_PER_SEC, 3)

    print(json.dumps({
        "metric": "DTU depth maps/sec/chip (1152x864, N=5, iter=4, bf16)",
        "value": round(maps_paper, 3),
        "unit": "maps/sec",
        "vs_baseline": round(maps_paper / BASELINE_MAPS_PER_SEC, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
