"""Tanks&Temples / ETH3D / BlendedMVS loaders on miniature fixtures.

Each fixture writes the exact on-disk layout the loader (and the
reference implementation) expects, using the analytic plane scene for
images/depths, and validates the loader contract: metas enumeration,
pyramid shapes at the requested img_wh, intrinsics rescaling, and the
dataset-specific rules (ETH3D negative-depth clamp, BlendedMVS per-scan
100/depth_min rescaling + in-range masks + min-source filtering).
"""
import os

import numpy as np
import pytest

from itermvs_tpu.io import save_pfm, write_cam_file, write_pair_file
from tests.synthetic_scene import make_cameras, render_view, Z0

DEPTH_MIN, DEPTH_MAX = 2.0, 10.0


def _write_eval_scan(scan_dir, num_views, width, height, rng,
                     cams_dirname="cams_1", images_dirname="images",
                     depth_dir=None, cam_depth_min=DEPTH_MIN,
                     pair_in_cams=False):
    from PIL import Image

    os.makedirs(os.path.join(scan_dir, images_dirname), exist_ok=True)
    os.makedirs(os.path.join(scan_dir, cams_dirname), exist_ok=True)
    if depth_dir:
        os.makedirs(os.path.join(scan_dir, depth_dir), exist_ok=True)

    cams = make_cameras(num_views, width, height, rng)
    for v, (K, E) in enumerate(cams):
        rgb, depth = render_view(K, E, width, height)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(scan_dir, images_dirname, f"{v:08d}.jpg"), quality=95)
        write_cam_file(os.path.join(scan_dir, cams_dirname, f"{v:08d}_cam.txt"),
                       K, E, cam_depth_min, DEPTH_MAX)
        if depth_dir:
            save_pfm(os.path.join(scan_dir, depth_dir, f"{v:08d}.pfm"),
                     depth.astype(np.float32))

    pairs = [(v, [(s, 10.0) for s in range(num_views) if s != v])
             for v in range(num_views)]
    pair_path = (os.path.join(scan_dir, cams_dirname, "pair.txt")
                 if pair_in_cams else os.path.join(scan_dir, "pair.txt"))
    write_pair_file(pair_path, pairs)


def test_tanks_loader(tmp_path):
    from itermvs_tpu.data import find_dataset_def
    from itermvs_tpu.data.tanks import INTERMEDIATE_SCANS

    rng = np.random.RandomState(0)
    root = str(tmp_path)
    for scan in INTERMEDIATE_SCANS:
        _write_eval_scan(os.path.join(root, "intermediate", scan),
                         num_views=3, width=256, height=192, rng=rng)

    ds = find_dataset_def("tanks")(root, n_views=3, img_wh=(128, 96),
                                   split="intermediate")
    assert len(ds) == len(INTERMEDIATE_SCANS) * 3
    s = ds[0]
    assert s["imgs"]["level_0"].shape == (3, 96, 128, 3)
    assert s["imgs"]["level_3"].shape == (3, 12, 16, 3)
    assert s["filename"] == INTERMEDIATE_SCANS[0] + "/{}/00000000{}"
    # intrinsics rescaled by 0.5: principal point lands at img_wh/2
    p0 = s["proj_matrices"]["level_0"][0]
    uvw = p0[:3] @ np.array([0.0, 0.0, Z0, 1.0])
    assert abs(uvw[0] / uvw[2] - 64.0) < 1e-3
    assert abs(uvw[1] / uvw[2] - 48.0) < 1e-3


def test_eth3d_loader_clamps_negative_depth_min(tmp_path):
    from itermvs_tpu.data import find_dataset_def
    from itermvs_tpu.data.eth3d import TEST_SCANS

    rng = np.random.RandomState(1)
    root = str(tmp_path)
    for scan in TEST_SCANS:
        _write_eval_scan(os.path.join(root, scan), num_views=3,
                         width=128, height=96, rng=rng, cam_depth_min=-0.5)

    ds = find_dataset_def("eth3d")(root, split="test", n_views=3,
                                   img_wh=(128, 96))
    assert len(ds) == len(TEST_SCANS) * 3
    s = ds[0]
    assert s["depth_min"] == np.float32(1.0)        # clamp (eth3d.py:50-52)
    assert s["depth_max"] == np.float32(DEPTH_MAX)
    assert s["imgs"]["level_0"].shape == (3, 96, 128, 3)


def test_blendedmvs_loader(tmp_path):
    from itermvs_tpu.data import find_dataset_def

    rng = np.random.RandomState(2)
    root = str(tmp_path)
    scan = "5a0271884e62597cdee0d0eb"
    _write_eval_scan(os.path.join(root, scan), num_views=4, width=96,
                     height=64, rng=rng, cams_dirname="cams",
                     images_dirname="blended_images",
                     depth_dir="rendered_depth_maps", pair_in_cams=True)
    listfile = str(tmp_path / "list.txt")
    with open(listfile, "w") as f:
        f.write(scan + "\n")

    ds = find_dataset_def("blendedmvs")(root, listfile, "val", 4,
                                        img_wh=(96, 64), robust_train=False)
    assert len(ds) == 4
    s = ds[0]
    # per-scan rescale: factor = 100 / depth_min -> depth_min becomes 100
    assert s["depth_min"] == np.float32(100.0)
    np.testing.assert_allclose(s["depth_max"], 100.0 / DEPTH_MIN * DEPTH_MAX,
                               rtol=1e-6)
    # GT is the plane at Z0, rescaled by the same factor; mask in-range
    factor = 100.0 / DEPTH_MIN
    gt = s["depth"]["level_0"][..., 0]
    mask = s["mask"]["level_0"][..., 0] > 0.5
    assert mask.mean() > 0.99
    np.testing.assert_allclose(gt[mask], Z0 * factor, rtol=1e-3)

    # metas require >= nviews-1 sources: with 4 views and nviews=5,
    # every ref has only 3 sources -> empty dataset
    ds5 = find_dataset_def("blendedmvs")(root, listfile, "val", 5,
                                         img_wh=(96, 64), robust_train=False)
    assert len(ds5) == 0


def test_scan_shard_helpers():
    """--scan_shard round-robins scan-keyed metas and pins single-scan
    datasets to shard 0; every scan lands on exactly one shard."""
    import pytest

    from eval import apply_scan_shard, parse_scan_shard, shard_scans

    assert parse_scan_shard(None) is None
    assert parse_scan_shard("2/4") == (2, 4)
    for bad in ("4/4", "-1/2", "x/2", "2"):
        with pytest.raises(SystemExit):
            parse_scan_shard(bad)

    scans = [f"scan{i}" for i in range(7)]
    pieces = [shard_scans(scans, (i, 3)) for i in range(3)]
    assert sorted(s for p in pieces for s in p) == sorted(scans)
    assert pieces[0] == ["scan0", "scan3", "scan6"]

    class FakeDS:
        def __init__(self, metas):
            self.metas = metas

    # Scan-keyed metas (dtu_yao_eval/tanks/eth3d shape).
    metas = [(s, ref, [1, 2]) for s in scans for ref in range(3)]
    covered = []
    for i in range(3):
        ds = apply_scan_shard(FakeDS(list(metas)), (i, 3))
        covered += [m[0] for m in ds.metas]
        # whole scans move together
        for s in set(m[0] for m in ds.metas):
            assert sum(1 for m in ds.metas if m[0] == s) == 3
    assert sorted(set(covered)) == sorted(scans)
    assert len(covered) == len(metas)

    # Single-scan metas (custom shape): shard 0 keeps all, others none.
    single = [(ref, [1, 2]) for ref in range(4)]
    assert apply_scan_shard(FakeDS(list(single)), (0, 2)).metas == single
    assert apply_scan_shard(FakeDS(list(single)), (1, 2)).metas == []
    assert apply_scan_shard(FakeDS(list(single)), None).metas == single


def test_decode_cache_hits_and_parity(tmp_path, monkeypatch):
    """The eval pyramid LRU must (a) return arrays identical to a fresh
    decode, (b) actually hit when the same image recurs across samples
    (each image serves ~n_views metas), and (c) bypass cleanly when
    disabled."""
    from itermvs_tpu.data import base as dbase
    from itermvs_tpu.data.base import _PyramidCache, image_pyramid

    scan = tmp_path / "scan1"
    rng = np.random.RandomState(0)
    _write_eval_scan(str(scan), 3, 64, 48, rng)
    img = str(scan / "images" / "00000000.jpg")

    cache = _PyramidCache(64)
    monkeypatch.setattr(dbase, "_pyramid_cache", cache)

    pyr, (ow, oh) = dbase.cached_image_pyramid(img, (32, 24))
    assert (ow, oh) == (64, 48)
    from PIL import Image

    fresh = image_pyramid(Image.open(img), (32, 24))
    for k in fresh:
        np.testing.assert_array_equal(pyr[k], fresh[k])
    assert not pyr["level_0"].flags.writeable   # read-only by contract

    pyr2, _ = dbase.cached_image_pyramid(img, (32, 24))
    assert cache.hits == 1 and cache.misses == 1
    assert pyr2["level_1"] is pyr["level_1"]    # same entry, no redecode

    # Different target size is a different entry.
    dbase.cached_image_pyramid(img, (16, 12))
    assert cache.misses == 2

    # Through a real eval dataset: sample 0 and sample 1 share views.
    from itermvs_tpu.data import find_dataset_def

    (tmp_path / "list.txt").write_text("scan1\n")
    write_pair_file(str(scan / "pair.txt"),
                    [(0, [(1, 1.0), (2, 1.0)]), (1, [(0, 1.0), (2, 1.0)]),
                     (2, [(0, 1.0), (1, 1.0)])])
    ds = find_dataset_def("dtu_yao_eval")(
        str(tmp_path), str(tmp_path / "list.txt"), nviews=3, img_wh=(32, 24))
    before = cache.misses
    ds[0]
    ds[1]
    # image 0 was cached above; images 1 and 2 are the only new decodes
    # across both samples (6 views served).
    assert cache.misses - before == 2
    assert cache.hits >= 4                      # views re-served from cache

    # Disabled cache (cap 0) still decodes correctly, stores nothing.
    empty = _PyramidCache(0)
    monkeypatch.setattr(dbase, "_pyramid_cache", empty)
    pyr3, _ = dbase.cached_image_pyramid(img, (32, 24))
    np.testing.assert_array_equal(pyr3["level_0"], fresh["level_0"])
    assert len(empty.data) == 0
