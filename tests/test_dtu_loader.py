"""DTU training-layout loader on the synthetic fixture.

Validates the full loader contract train.py relies on: pyramid shapes,
GT depth/image alignment (fronto-parallel plane -> constant ref depth
Z0 x robust scale), depth-range scaling, and the x4 intrinsics
correction for DTU's quarter-resolution cam files.
"""
import os

import numpy as np

from tests.synthetic_scene import build_dtu_training_dir, Z0, DEPTH_MIN, DEPTH_MAX


def test_dtu_training_fixture_loader(tmp_path):
    from itermvs_tpu.data import find_dataset_def

    root = str(tmp_path / "dtu")
    os.makedirs(root)
    listfile = build_dtu_training_dir(root, num_views=5, num_refs=2)

    # deterministic (no jitter/scale) path first
    ds = find_dataset_def("dtu_yao")(root, listfile, "val", 5,
                                     robust_train=False, seed=0)
    assert len(ds) == 2 * 7          # refs x light conditions
    s = ds[0]
    for lvl in range(4):
        h, w = 512 >> lvl, 640 >> lvl
        assert s["imgs"][f"level_{lvl}"].shape == (5, h, w, 3)
        assert s["proj_matrices"][f"level_{lvl}"].shape == (5, 4, 4)
        assert s["depth"][f"level_{lvl}"].shape == (h, w, 1)
        assert s["mask"][f"level_{lvl}"].shape == (h, w, 1)
    assert s["depth_min"] == np.float32(DEPTH_MIN)
    assert s["depth_max"] == np.float32(DEPTH_MAX)
    # ref camera sits at the origin looking at the plane z = Z0.
    np.testing.assert_allclose(s["depth"]["level_0"][..., 0], Z0, atol=1e-3)
    assert (s["mask"]["level_0"] > 0.5).all()
    # images scaled to [-1, 1]
    assert s["imgs"]["level_0"].min() >= -1.0 and s["imgs"]["level_0"].max() <= 1.0

    # level_0 projection = K E with K recovered at full image resolution:
    # project the plane point seen at image center back to the center.
    p0 = s["proj_matrices"]["level_0"][0]
    world = np.array([0.0, 0.0, Z0, 1.0])
    # ref extrinsic is identity; principal point maps z-axis point to (cx, cy)
    uvw = p0[:3] @ world
    assert abs(uvw[0] / uvw[2] - 320.0) < 1e-3
    assert abs(uvw[1] / uvw[2] - 256.0) < 1e-3

    # robust-train path: depth, translation and range share one scale
    ds_r = find_dataset_def("dtu_yao")(root, listfile, "train", 5,
                                       robust_train=True, seed=3)
    s = ds_r[0]
    scale = s["depth_min"] / DEPTH_MIN
    assert 0.8 <= scale <= 1.25
    np.testing.assert_allclose(s["depth_max"], DEPTH_MAX * scale, rtol=1e-6)
    np.testing.assert_allclose(s["depth"]["level_0"][..., 0], Z0 * scale,
                               atol=1e-2)


def _collect_epoch(root, listfile, seed, num_workers):
    from itermvs_tpu.data import find_dataset_def
    from itermvs_tpu.data.loader import DataLoader

    ds = find_dataset_def("dtu_yao")(root, listfile, "train", 5,
                                     robust_train=True, seed=seed)
    loader = DataLoader(ds, batch_size=2, shuffle=True,
                        num_workers=num_workers, drop_last=True, seed=seed)
    return [batch for batch in loader]


def test_threaded_loader_reproducible(tmp_path):
    """Same seed -> bitwise-identical samples under 4 worker threads.

    Guards the per-item RNG scheme: robust-train view selection, scale
    jitter and ColorJitter must not depend on thread scheduling
    (round-1 bug: one shared np.random.Generator across workers)."""
    root = str(tmp_path / "dtu")
    os.makedirs(root)
    listfile = build_dtu_training_dir(root, num_views=5, num_refs=2)

    a = _collect_epoch(root, listfile, seed=7, num_workers=4)
    b = _collect_epoch(root, listfile, seed=7, num_workers=4)
    c = _collect_epoch(root, listfile, seed=7, num_workers=1)
    assert len(a) == len(b) == len(c) > 0
    for ba, bb, bc in zip(a, b, c):
        for key in ("imgs", "proj_matrices", "depth", "mask"):
            for lvl, va in ba[key].items():
                np.testing.assert_array_equal(va, bb[key][lvl])
                np.testing.assert_array_equal(va, bc[key][lvl])
        np.testing.assert_array_equal(ba["depth_min"], bb["depth_min"])
        np.testing.assert_array_equal(ba["depth_min"], bc["depth_min"])


def test_loader_epoch_variation(tmp_path):
    """Augmentation varies across epochs (set_epoch feeds the item RNG)."""
    from itermvs_tpu.data import find_dataset_def
    from itermvs_tpu.data.loader import DataLoader

    root = str(tmp_path / "dtu")
    os.makedirs(root)
    listfile = build_dtu_training_dir(root, num_views=5, num_refs=2)
    ds = find_dataset_def("dtu_yao")(root, listfile, "train", 5,
                                     robust_train=True, seed=1)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
    e0 = [b["depth_min"] for b in loader]
    e1 = [b["depth_min"] for b in loader]
    # robust-train scale jitter differs between epochs for the same items
    assert any(not np.array_equal(x, y) for x, y in zip(e0, e1))

def test_process_loader_matches_threaded(tmp_path):
    """worker_processes > 0 decodes in OS processes (the multi-core
    path for the CPU-bound PNG/PFM decode, loader.py) and must yield
    bitwise-identical batches to the threaded loader — per-item RNG is
    a pure function of (seed, epoch, idx), so the execution vehicle
    cannot leak into the samples."""
    from itermvs_tpu.data import find_dataset_def
    from itermvs_tpu.data.loader import DataLoader

    root = str(tmp_path / "dtu")
    os.makedirs(root)
    listfile = build_dtu_training_dir(root, num_views=5, num_refs=2)
    ds = find_dataset_def("dtu_yao")(root, listfile, "train", 5,
                                     robust_train=True, seed=3)
    threaded = DataLoader(ds, batch_size=2, shuffle=True, num_workers=4,
                          drop_last=True, seed=3)
    procs = DataLoader(ds, batch_size=2, shuffle=True, num_workers=4,
                       drop_last=True, seed=3, worker_processes=2)
    if procs.worker_processes == 0:
        import pytest
        pytest.skip("no fork start method on this platform")
    a = list(threaded)
    b = list(procs)
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        for key in ("imgs", "proj_matrices", "depth", "mask"):
            for lvl, va in ba[key].items():
                np.testing.assert_array_equal(va, bb[key][lvl])
        np.testing.assert_array_equal(ba["depth_min"], bb["depth_min"])
        np.testing.assert_array_equal(ba["depth_max"], bb["depth_max"])


def test_decode_cache_clear_and_cap_split(tmp_path):
    """The eval decode LRU supports bench's decode-cold reset and the
    process-pool workers' cap split (aggregate across N workers stays
    within ITERMVS_DECODE_CACHE_MB, data/loader.py:_init_worker)."""
    from PIL import Image

    from itermvs_tpu.data import base

    paths = []
    rng = np.random.RandomState(0)
    for i in range(4):
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(
            rng.randint(0, 255, (64, 80, 3), dtype=np.uint8)).save(p)
        paths.append(p)

    cache = base._pyramid_cache
    old_cap = cache.cap
    try:
        base.clear_decode_cache()
        cache.set_cap(1e6 / 1e6 * 4)          # 4 MB: holds all 4 pyramids
        for p in paths:
            base.cached_image_pyramid(p, (80, 64))
        assert len(cache.data) == 4
        h0, m0 = cache.hits, cache.misses
        base.cached_image_pyramid(paths[0], (80, 64))
        assert cache.hits == h0 + 1 and cache.misses == m0

        one = sum(a.nbytes for a in cache.data[next(iter(cache.data))][0]
                  .values())
        cache.set_cap(2.5 * one / 1e6)        # shrink → LRU eviction
        assert len(cache.data) == 2
        assert cache.size <= cache.cap

        base.clear_decode_cache()
        assert len(cache.data) == 0 and cache.size == 0
    finally:
        cache.set_cap(old_cap / 1e6)
        base.clear_decode_cache()
