"""Feature-cached inference path: extract/match == monolithic forward.

The eval.py feature cache rests on one invariant: computing FeatureNet
per view (batch 1) and matching on the stacked features is exactly the
monolithic `Pipeline.__call__` (eval-mode BN uses running statistics,
so features are independent of what shares the batch). These tests pin
that invariant and the dataset plumbing (scan/view_ids keys) it needs.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from itermvs_tpu.models import Pipeline


@pytest.fixture(scope="module")
def small_setup():
    b, v, h, w = 1, 4, 96, 128
    rng = np.random.RandomState(0)
    imgs = {"level_0": jnp.asarray(rng.rand(b, v, h, w, 3), jnp.float32)}
    projs = {}
    for level in (1, 2, 3):
        scale = 2 ** level
        k = np.tile(np.eye(4, dtype=np.float32), (b, v, 1, 1))
        k[:, :, 0, 0] = 100.0 / scale
        k[:, :, 1, 1] = 100.0 / scale
        k[:, :, 0, 2] = w / (2.0 * scale)
        k[:, :, 1, 2] = h / (2.0 * scale)
        k[:, :, 0, 3] = rng.randn(b, v) * 0.1
        projs[f"level_{level}"] = jnp.asarray(k)
    dmin = jnp.full((b,), 2.0, jnp.float32)
    dmax = jnp.full((b,), 10.0, jnp.float32)
    model = Pipeline(iteration=2, test=True)
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dmin, dmax)
    return model, variables, imgs, projs, dmin, dmax


def test_extract_match_equals_forward(small_setup):
    model, variables, imgs, projs, dmin, dmax = small_setup
    ref = model.apply(variables, imgs, projs, dmin, dmax)

    # Per-view batch-1 extraction, stacked, then match — the eval.py
    # cached path.
    v = imgs["level_0"].shape[1]
    per_view = [model.apply(variables, imgs["level_0"][:, i],
                            method=Pipeline.extract) for i in range(v)]
    # Both accepted forms: stacked [B, V, ...] and per-view list.
    feats = {lvl: jnp.concatenate([f[lvl] for f in per_view], axis=0)[None]
             for lvl in ("level1", "level2", "level3")}
    out_stacked = model.apply(variables, feats, projs, dmin, dmax,
                              method=Pipeline.match)
    out_list = model.apply(variables, tuple(per_view), projs, dmin, dmax,
                           method=Pipeline.match)

    # Pre-packed sources (the table-caching eval path): source entries
    # are corner-packed tables built once outside match; must go through
    # a jit boundary to exercise the PackedSource pytree registration.
    from itermvs_tpu.ops.warping import pack_bilinear
    prepack = jax.jit(lambda f: {k: pack_bilinear(x) for k, x in f.items()})
    packed = (per_view[0], *(prepack(f) for f in per_view[1:]))
    match = jax.jit(lambda f, p, lo, hi: model.apply(
        variables, f, p, lo, hi, method=Pipeline.match))
    out_packed = match(packed, projs, dmin, dmax)

    for key in ("depths_upsampled", "confidence_upsampled"):
        a = np.asarray(ref[key])
        for out in (out_stacked, out_list):
            b = np.asarray(out[key])
            assert np.allclose(a, b, rtol=0, atol=1e-6), (
                f"{key}: max diff {np.abs(a - b).max()}")
        # Packing is exact data movement, but the pre-packed form runs
        # under a different jit program than the unjitted reference —
        # allow f32 fusion/reassociation noise (observed ~1e-6 on
        # depths of O(5)).
        b = np.asarray(out_packed[key])
        assert np.allclose(a, b, rtol=1e-5, atol=1e-5), (
            f"{key} (packed): max diff {np.abs(a - b).max()}")


def test_prepacked_banded_sources(small_setup, monkeypatch):
    """Pre-packed sources whose level-1 tables exceed the fast-gather
    row limit arrive as BandedSource pytrees (the DTU eval-resolution
    case: 1600×1152 level-1 tables band, level-2/3 stay flat). The
    mixed Packed/Banded pytree must cross the prepack→cache→match jit
    boundaries and reproduce the monolithic forward."""
    import sys

    import itermvs_tpu.ops.grid_sample  # noqa: F401
    gs = sys.modules["itermvs_tpu.ops.grid_sample"]

    model, variables, imgs, projs, dmin, dmax = small_setup
    ref = model.apply(variables, imgs, projs, dmin, dmax)

    v = imgs["level_0"].shape[1]
    per_view = [model.apply(variables, imgs["level_0"][:, i],
                            method=Pipeline.extract) for i in range(v)]

    # level1 at 96×128 is 48·64 = 3072 rows → over the limit; level2
    # (768) and level3 (192) stay under → PackedSource. With the limit
    # at 1000 the over-limit level arrives as a SuperpixelSource (pair
    # table 1536 rows doesn't fit) or, with superpixel off, as row
    # bands; with the limit at 2000 it arrives as a PairSource. All
    # three mixed pytrees must cross the prepack→cache→match jit
    # boundaries and reproduce the monolithic forward.
    from itermvs_tpu.ops.warping import pack_bilinear
    for superpixel, limit, kind in (
            (True, 1000, gs.SuperpixelSource),
            (True, 2000, gs.PairSource),
            (False, 1000, gs.BandedSource)):
        monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", limit)
        monkeypatch.setattr(gs, "SUPERPIXEL_PACKING", superpixel)
        prepack = jax.jit(
            lambda f: {k: pack_bilinear(x) for k, x in f.items()})
        packed_views = [prepack(f) for f in per_view[1:]]
        assert isinstance(packed_views[0]["level1"], kind)
        assert isinstance(packed_views[0]["level2"], gs.PackedSource)

        match = jax.jit(lambda f, p, lo, hi: model.apply(
            variables, f, p, lo, hi, method=Pipeline.match))
        out = match((per_view[0], *packed_views), projs, dmin, dmax)

        for key in ("depths_upsampled", "confidence_upsampled"):
            a = np.asarray(ref[key])
            b = np.asarray(out[key])
            assert np.allclose(a, b, rtol=1e-5, atol=1e-5), (
                f"{key} ({kind.__name__} prepack): "
                f"max diff {np.abs(a - b).max()}")


def test_eval_datasets_expose_view_ids(tmp_path):
    from tests.synthetic_scene import build_scene_dir
    from itermvs_tpu.data import find_dataset_def
    from itermvs_tpu.data.loader import DataLoader

    scene = str(tmp_path / "scene")
    build_scene_dir(scene, num_views=4, width=128, height=96,
                    write_gt_depth=False)
    ds = find_dataset_def("custom")(scene, 4, (128, 96))
    sample = ds[0]
    assert sample["scan"] == "custom"
    assert sample["view_ids"].dtype == np.int32
    assert sample["view_ids"].shape == (4,)
    assert sample["view_ids"][0] == 0  # ref view first

    batch = next(iter(DataLoader(ds, 1, shuffle=False, num_workers=0,
                                 drop_last=False)))
    assert batch["scan"] == ["custom"]
    assert batch["view_ids"].shape == (1, 4)
