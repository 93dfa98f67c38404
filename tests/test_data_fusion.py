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
