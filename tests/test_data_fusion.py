"""Loader + fusion tests on the synthetic plane scene."""
import os

import numpy as np
import pytest

from tests.synthetic_scene import build_scene_dir, Z0, DEPTH_MIN, DEPTH_MAX


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    cams, depths = build_scene_dir(root, num_views=4, width=128, height=96)
    return root, cams, depths


def test_custom_loader_shapes(scene):
    root, cams, _ = scene
    from itermvs_tpu.data import find_dataset_def

    ds = find_dataset_def("custom")(root, n_views=3, img_wh=(128, 96))
    assert len(ds) == 4
    sample = ds[0]
    assert sample["imgs"]["level_0"].shape == (3, 96, 128, 3)
    assert sample["imgs"]["level_3"].shape == (3, 12, 16, 3)
    assert sample["proj_matrices"]["level_0"].shape == (3, 4, 4)
    assert sample["depth_min"] == DEPTH_MIN and sample["depth_max"] == DEPTH_MAX
    assert sample["filename"] == "{}/00000000{}"
    # Projection pyramid consistency: P_l = diag-scaled K @ E.
    K, E = cams[0]
    p0 = sample["proj_matrices"]["level_0"][0]
    np.testing.assert_allclose(p0[:3, :4], K @ E[:3, :4], rtol=1e-4)
    p3 = sample["proj_matrices"]["level_3"][0]
    K3 = K.copy()
    K3[:2] *= 0.125
    np.testing.assert_allclose(p3[:3, :4], K3 @ E[:3, :4], rtol=1e-4)
    # Images scaled to [-1, 1].
    assert sample["imgs"]["level_0"].min() >= -1.0001
    assert sample["imgs"]["level_0"].max() <= 1.0001


def test_dataloader_batching(scene):
    root, _, _ = scene
    from itermvs_tpu.data import find_dataset_def
    from itermvs_tpu.data.loader import DataLoader

    ds = find_dataset_def("custom")(root, n_views=3, img_wh=(128, 96))
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["imgs"]["level_0"].shape == (2, 3, 96, 128, 3)
    assert batches[0]["depth_min"].shape == (2,)
    assert len(batches[0]["filename"]) == 2


def test_fusion_on_exact_depth(scene, tmp_path):
    """GT depth maps + unit confidence must fuse into the z=Z0 plane."""
    from itermvs_tpu.fusion import filter_depth
    from itermvs_tpu.io import read_ply

    root, _, _ = scene
    ply = str(tmp_path / "fused.ply")
    n, _ = filter_depth(root, root, ply, geo_pixel_thres=1.0, geo_depth_thres=0.01,
                        photo_thres=0.3, img_wh=(128, 96), geo_mask_thres=3,
                        verbose=False)
    assert n > 4 * 96 * 128 * 0.5, "most pixels should survive fusion"
    xyz, rgb = read_ply(ply)
    # All fused points must lie on the world plane z = Z0.
    assert np.abs(xyz[:, 2] - Z0).max() < 0.02
    assert rgb is not None and rgb.shape == xyz.shape


def test_fusion_streams_with_bounded_compiles(tmp_path):
    """Varying source counts must reuse a few bucketed kernel signatures,
    the decoded-view cache must stay bounded, and --display must write
    the five reference visualization images per ref view."""
    from itermvs_tpu import fusion
    from itermvs_tpu.io import write_pair_file

    root = str(tmp_path / "bigscene")
    build_scene_dir(root, num_views=14, width=64, height=48)
    # Pair list with ragged source counts 5..9 → buckets {6, 8, 10}.
    pairs = []
    for r in range(14):
        n_src = 5 + r % 5
        srcs = [(s % 14, 10.0) for s in range(r + 1, r + 1 + n_src)]
        pairs.append((r, srcs))
    write_pair_file(os.path.join(root, "pair.txt"), pairs)

    before = fusion._consistency_kernel._cache_size()
    ply = str(tmp_path / "fused_big.ply")
    n, secs = filter_depth_with_cache_probe(fusion, root, ply)
    assert n > 0 and secs > 0
    compiled = fusion._consistency_kernel._cache_size() - before
    assert compiled <= 3, f"expected ≤3 bucketed kernel compiles, got {compiled}"
    for r in range(14):
        for tag in ("ref_img", "ref_depth", "depth_photo_mask",
                    "depth_geo_mask", "depth_final_mask"):
            assert os.path.exists(os.path.join(root, f"display/{r:0>8}_{tag}.png"))


def filter_depth_with_cache_probe(fusion, root, ply):
    """Run filter_depth while asserting the view LRU never exceeds maxsize."""
    orig = fusion._ViewCache.view
    observed = []

    def probed(self, vid):
        out = orig(self, vid)
        observed.append(len(self._cache))
        assert len(self._cache) <= self.maxsize
        return out

    fusion._ViewCache.view = probed
    try:
        n, secs = fusion.filter_depth(
            root, root, ply, geo_pixel_thres=1.0, geo_depth_thres=0.01,
            photo_thres=0.3, img_wh=(64, 48), geo_mask_thres=3,
            verbose=False, display=True)
    finally:
        fusion._ViewCache.view = orig
    # 14 views, max 9 srcs → maxsize 12 < 14: eviction must have happened.
    assert max(observed) <= 12
    return n, secs


def _reference_consistency(ref_depth, src_depth, k_ref, e_ref, k_src, e_src,
                           pix_thres, depth_thres):
    """Literal NumPy port of the reference's geometric check
    (eval.py:154-209: reproject_with_depth + check_geometric_consistency)
    for cross-validating the batched TPU kernel."""
    import cv2

    h, w = ref_depth.shape
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    pix = np.stack([xs.ravel(), ys.ravel(), np.ones(h * w)], 0)   # [3, P]
    xyz_ref = np.linalg.inv(k_ref) @ (pix * ref_depth.reshape(1, -1))
    rel = (e_src @ np.linalg.inv(e_ref))
    xyz_src = rel[:3, :3] @ xyz_ref + rel[:3, 3:4]
    k_xyz = k_src @ xyz_src
    xy_src = k_xyz[:2] / k_xyz[2:3]
    x_src = xy_src[0].reshape(h, w).astype(np.float32)
    y_src = xy_src[1].reshape(h, w).astype(np.float32)
    sampled = cv2.remap(src_depth.astype(np.float32), x_src, y_src,
                        interpolation=cv2.INTER_LINEAR)           # zeros border
    xyz_src2 = (np.linalg.inv(k_src)
                @ (np.stack([x_src.ravel(), y_src.ravel(), np.ones(h * w)], 0)
                   * sampled.reshape(1, -1)))
    rel_back = e_ref @ np.linalg.inv(e_src)
    xyz_rep = rel_back[:3, :3] @ xyz_src2 + rel_back[:3, 3:4]
    depth_rep = xyz_rep[2].reshape(h, w)
    k_rep = k_ref @ xyz_rep
    xy_rep = k_rep[:2] / (k_rep[2:3] + 1e-6)
    x_rep = xy_rep[0].reshape(h, w)
    y_rep = xy_rep[1].reshape(h, w)
    dist = np.sqrt((x_rep - xs) ** 2 + (y_rep - ys) ** 2)
    relative = np.abs(depth_rep - ref_depth) / ref_depth
    mask = (dist < pix_thres) & (relative < depth_thres)
    return mask, depth_rep


def test_consistency_kernel_matches_reference_math(tmp_path):
    """The batched TPU consistency kernel must reproduce the reference's
    per-(ref,src) NumPy/cv2 fusion math on a scene with real occlusion
    (sphere + step): same geo masks and the same averaged depth."""
    import jax.numpy as jnp
    from itermvs_tpu import fusion

    root = str(tmp_path / "sphere_scene")
    cams, depths = build_scene_dir(root, num_views=5, width=160, height=120,
                                   scene="sphere_step")
    ref_view, srcs = 0, [1, 2, 3, 4]
    k_ref, e_ref = (c.astype(np.float64) for c in cams[ref_view])
    ref_depth = depths[ref_view].astype(np.float64)
    h, w = ref_depth.shape

    masks, reps = [], []
    for s in srcs:
        k_s, e_s = (c.astype(np.float64) for c in cams[s])
        m, rep = _reference_consistency(ref_depth, depths[s], k_ref, e_ref,
                                        k_s, e_s, 1.0, 0.01)
        masks.append(m)
        reps.append(rep)
    geo_sum_ref = np.sum(masks, axis=0)
    avg_ref = (np.sum([np.where(m, r, 0.0) for m, r in zip(masks, reps)],
                      axis=0) + ref_depth) / (geo_sum_ref + 1)

    rel_r2s = np.stack([cams[s][1].astype(np.float64)
                        @ np.linalg.inv(e_ref) for s in srcs]).astype(np.float32)
    rel_s2r = np.stack([e_ref @ np.linalg.inv(cams[s][1].astype(np.float64))
                        for s in srcs]).astype(np.float32)
    k_srcs = np.stack([cams[s][0] for s in srcs]).astype(np.float32)
    k_srcs_inv = np.stack([np.linalg.inv(cams[s][0].astype(np.float64))
                           for s in srcs]).astype(np.float32)
    depth_q, lo, hi, bits = fusion._consistency_kernel(
        jnp.asarray(ref_depth, jnp.float32), jnp.ones((h, w), jnp.float32),
        jnp.asarray(np.stack([depths[s] for s in srcs])),
        jnp.ones(len(srcs), jnp.float32),
        jnp.asarray(rel_r2s), jnp.asarray(rel_s2r),
        jnp.asarray(k_ref, jnp.float32),
        jnp.asarray(np.linalg.inv(k_ref), jnp.float32),
        jnp.asarray(k_srcs), jnp.asarray(k_srcs_inv),
        geo_pixel_thres=1.0, geo_depth_thres=0.01, photo_thres=0.3,
        geo_mask_thres=3)
    # Dequantize the uint16 wire format (adds ≤(hi−lo)/65535/2 ≈ 2e-5
    # absolute error here — far under the 1e-3 relative tolerance).
    lo, hi = np.float64(lo), np.float64(hi)
    avg_got = lo + np.asarray(depth_q, np.float64) * ((hi - lo) / 65535.0)
    geo_got = (np.asarray(bits) & 2) > 0

    # Threshold tests can flip on borderline pixels (f32 vs f64 math):
    # demand agreement everywhere except a thin disagreement set.
    geo_mask_ref = geo_sum_ref >= 3
    disagree = np.mean(geo_mask_ref != geo_got)
    assert disagree < 0.005, f"geo masks disagree on {disagree:.2%} of pixels"
    both = geo_mask_ref & geo_got
    rel_err = np.abs(avg_got[both] - avg_ref[both]) / avg_ref[both]
    assert np.quantile(rel_err, 0.99) < 1e-3
    # The scene actually exercises occlusion: some pixels must fail.
    assert geo_mask_ref.mean() < 0.995 and geo_mask_ref.mean() > 0.5


def test_fusion_on_sphere_step_scene(tmp_path):
    """Exact depths of the discontinuous scene must fuse into a cloud
    that matches the analytic visible surface (chamfer via dtu_score)."""
    from itermvs_tpu.fusion import filter_depth
    from itermvs_tpu.io import read_ply, write_ply
    from itermvs_tpu.benchmark.dtu_score import score
    from tests.synthetic_scene import gt_point_cloud

    root = str(tmp_path / "sphere_scene2")
    cams, depths = build_scene_dir(root, num_views=5, width=160, height=120,
                                   scene="sphere_step")
    ply = str(tmp_path / "fused_sphere.ply")
    n, _ = filter_depth(root, root, ply, geo_pixel_thres=1.0,
                        geo_depth_thres=0.01, photo_thres=0.3,
                        img_wh=(160, 120), geo_mask_thres=3, verbose=False)
    assert n > 120 * 160, "fusion culled too much of the exact scene"
    xyz, _ = read_ply(ply)
    gt = gt_point_cloud(cams, depths, stride=1)
    gt_ply = str(tmp_path / "gt_sphere.ply")
    write_ply(gt_ply, gt, np.zeros_like(gt, dtype=np.uint8))
    result = score(ply, gt_ply, density=0.02, max_dist=1.0)
    # Exact inputs → both sides must agree to well under a hundredth of
    # a world unit despite the discontinuities.
    assert result["accuracy_mm"] < 0.01, result
    assert result["completeness_mm"] < 0.05, result


def test_fusion_rejects_inconsistent_depth(scene, tmp_path):
    """Corrupting one view's depth map should cull its fused points."""
    import shutil
    from itermvs_tpu.io import save_pfm, read_pfm
    from itermvs_tpu.fusion import filter_depth

    root, _, _ = scene
    work = str(tmp_path / "scenecopy")
    shutil.copytree(root, work)
    # Corrupt view 0's depth badly.
    bad = read_pfm(os.path.join(work, "depth_est/00000000.pfm"))[0][..., 0]
    save_pfm(os.path.join(work, "depth_est/00000000.pfm"), bad * 1.5)
    ply = str(tmp_path / "fused_bad.ply")
    filter_depth(work, work, ply, geo_pixel_thres=1.0, geo_depth_thres=0.01,
                 photo_thres=0.3, img_wh=(128, 96), geo_mask_thres=3,
                 verbose=False)
    from PIL import Image
    final0 = np.array(Image.open(os.path.join(work, "mask/00000000_final.png")))
    assert final0.mean() < 10, "corrupted view should fail geometric check"
