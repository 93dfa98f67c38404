"""Parity tests for grid_sample / warping vs torch and analytic cases."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from itermvs_tpu.ops import grid_sample, differentiable_warp, warp_corr
from itermvs_tpu.ops.warping import relative_projection
from itermvs_tpu.ops.depth_range import depth_normalization, depth_unnormalization

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_grid_sample(src_nhwc, grid):
    """torch reference: bilinear, zeros, align_corners=True."""
    src = torch.from_numpy(src_nhwc).permute(0, 3, 1, 2)
    g = torch.from_numpy(grid)
    out = F.grid_sample(src, g, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    return out.permute(0, 2, 3, 1).numpy()


def test_grid_sample_matches_torch_random(rng):
    src = rng.rand(2, 9, 13, 6).astype(np.float32)
    grid = (rng.rand(2, 7, 11, 2).astype(np.float32) * 3.0 - 1.5)  # incl. OOB
    ref = torch_grid_sample(src, grid)
    got = np.asarray(grid_sample(jnp.asarray(src), jnp.asarray(grid)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_grid_sample_identity(rng):
    src = rng.rand(1, 8, 8, 3).astype(np.float32)
    ys, xs = np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8), indexing="ij")
    grid = np.stack([xs, ys], -1)[None].astype(np.float32)
    got = np.asarray(grid_sample(jnp.asarray(src), jnp.asarray(grid)))
    np.testing.assert_allclose(got, src, atol=1e-5)


def _random_camera(rng, w, h, tz=0.0):
    K = np.array([[w * 1.2, 0, w / 2], [0, w * 1.2, h / 2], [0, 0, 1]], np.float32)
    angle = rng.uniform(-0.05, 0.05, 3)
    cx, cy, cz = np.cos(angle)
    sx, sy, sz = np.sin(angle)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    R = (Rx @ Ry @ Rz).astype(np.float32)
    t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1), tz], np.float32)
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[:3, 3] = t
    P = np.eye(4, dtype=np.float32)
    P[:3, :4] = K @ E[:3, :4]
    return P


def torch_differentiable_warping(src_fea, src_proj, ref_proj, depth_samples):
    """Independent torch re-derivation of the reference warp semantics."""
    src_fea = torch.from_numpy(src_fea)          # [B, C, H1, W1]
    src_proj = torch.from_numpy(src_proj)
    ref_proj = torch.from_numpy(ref_proj)
    depth = torch.from_numpy(depth_samples)      # [B, N, H, W]
    b, n, h, w = depth.shape
    h1, w1 = src_fea.shape[2:]
    dt = src_fea.dtype
    proj = src_proj @ torch.inverse(ref_proj)
    rot, trans = proj[:, :3, :3], proj[:, :3, 3:4]
    y, x = torch.meshgrid(torch.arange(h, dtype=dt),
                          torch.arange(w, dtype=dt), indexing="ij")
    y = y.reshape(-1) * (h1 / h)
    x = x.reshape(-1) * (w1 / w)
    xyz = torch.stack([x, y, torch.ones_like(x)])[None].repeat(b, 1, 1)
    rot_xyz = rot @ xyz
    pxyz = rot_xyz[:, :, None] * depth.reshape(b, 1, n, h * w) + trans[..., None]
    valid = pxyz[:, 2:] > 1e-2
    px = torch.where(valid[:, 0], pxyz[:, 0], torch.tensor(float(w), dtype=dt))
    py = torch.where(valid[:, 0], pxyz[:, 1], torch.tensor(float(h), dtype=dt))
    pz = torch.where(valid[:, 0], pxyz[:, 2], torch.tensor(1.0, dtype=dt))
    gx = (px / pz) / ((w1 - 1) / 2) - 1
    gy = (py / pz) / ((h1 - 1) / 2) - 1
    grid = torch.stack([gx, gy], dim=3)          # [B, N, H*W, 2]
    out = F.grid_sample(src_fea, grid.reshape(b, n * h, w, 2), mode="bilinear",
                        padding_mode="zeros", align_corners=True)
    return out.reshape(b, -1, n, h, w).numpy()   # [B, C, N, H, W]


def test_warp_matches_torch_rederivation_f64(rng):
    """Semantic equivalence: in float64 both pipelines must agree ~1e-9."""
    from jax import enable_x64

    b, c, h1, w1 = 2, 8, 16, 24
    h, w = 8, 12
    n = 5
    src = rng.rand(b, c, h1, w1).astype(np.float64)
    ref_proj = np.stack([_random_camera(rng, w1, h1) for _ in range(b)]).astype(np.float64)
    src_proj = np.stack([_random_camera(rng, w1, h1, tz=0.3) for _ in range(b)]).astype(np.float64)
    depth = rng.uniform(2.0, 10.0, (b, n, h, w)).astype(np.float64)

    ref = torch_differentiable_warping(src, src_proj, ref_proj, depth)
    with enable_x64():
        proj = relative_projection(jnp.asarray(src_proj), jnp.asarray(ref_proj))
        got = np.asarray(differentiable_warp(
            jnp.asarray(src.transpose(0, 2, 3, 1)), proj, jnp.asarray(depth)))
    # ours: [B, N, H, W, C]; torch: [B, C, N, H, W]
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), ref, atol=1e-9)


def test_warp_matches_torch_rederivation_f32(rng):
    """fp32: agreement within geometry conditioning noise (sub-pixel)."""
    b, c, h1, w1 = 2, 8, 16, 24
    h, w = 8, 12
    n = 5
    src = rng.rand(b, c, h1, w1).astype(np.float32)
    ref_proj = np.stack([_random_camera(rng, w1, h1) for _ in range(b)])
    src_proj = np.stack([_random_camera(rng, w1, h1, tz=0.3) for _ in range(b)])
    depth = rng.uniform(2.0, 10.0, (b, n, h, w)).astype(np.float32)

    ref = torch_differentiable_warping(src, src_proj, ref_proj, depth)
    proj = np.asarray(relative_projection(jnp.asarray(src_proj), jnp.asarray(ref_proj)))
    got = np.asarray(differentiable_warp(
        jnp.asarray(src.transpose(0, 2, 3, 1)), jnp.asarray(proj), jnp.asarray(depth)))
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), ref, atol=5e-2)
    # and on average far tighter:
    assert np.abs(got.transpose(0, 4, 1, 2, 3) - ref).mean() < 2e-3


def test_warp_identity_projection(rng):
    """Identity relative projection at matching depth grid = identity warp."""
    b, h, w, c = 1, 8, 8, 4
    src = rng.rand(b, h, w, c).astype(np.float32)
    proj = np.eye(4, dtype=np.float32)[None]
    depth = np.full((b, 3, h, w), 5.0, np.float32)
    got = np.asarray(differentiable_warp(jnp.asarray(src), jnp.asarray(proj),
                                         jnp.asarray(depth)))
    for i in range(3):
        np.testing.assert_allclose(got[:, i], src, atol=1e-5)


def test_warp_corr_equals_manual_group_mean(rng):
    b, c, g = 1, 8, 4
    h = w = h1 = w1 = 8
    n = 2
    src = rng.rand(b, h1, w1, c).astype(np.float32)
    ref_fea = rng.rand(b, h, w, c).astype(np.float32)
    proj = np.eye(4, dtype=np.float32)[None]
    depth = rng.uniform(2, 4, (b, n, h, w)).astype(np.float32)
    warped = np.asarray(differentiable_warp(jnp.asarray(src), jnp.asarray(proj),
                                            jnp.asarray(depth)))
    manual = (warped.reshape(b, n, h, w, g, c // g)
              * ref_fea.reshape(b, 1, h, w, g, c // g)).mean(-1)
    got = np.asarray(warp_corr(jnp.asarray(src), jnp.asarray(ref_fea),
                               jnp.asarray(proj), jnp.asarray(depth), g))
    np.testing.assert_allclose(got, manual, atol=1e-6)


def test_warp_gradient_only_through_features(rng):
    """Grid is stop-gradiented: d(warp)/d(depth) must be zero."""
    b, h, w, c = 1, 6, 6, 2
    src = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    proj = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    depth = jnp.asarray(rng.uniform(2, 4, (b, 2, h, w)).astype(np.float32))

    g_depth = jax.grad(lambda d: differentiable_warp(src, proj, d).sum())(depth)
    np.testing.assert_array_equal(np.asarray(g_depth), 0.0)
    g_src = jax.grad(lambda s: differentiable_warp(s, proj, depth).sum())(src)
    assert np.abs(np.asarray(g_src)).sum() > 0


def test_depth_normalization_roundtrip(rng):
    dmin, dmax = 2.0, 10.0
    idmin, idmax = 1.0 / dmin, 1.0 / dmax
    d = jnp.asarray(rng.uniform(dmin, dmax, (4, 4)).astype(np.float32))
    nd = depth_normalization(d, idmin, idmax)
    back = depth_unnormalization(nd, idmin, idmax)
    np.testing.assert_allclose(np.asarray(back), np.asarray(d), rtol=1e-4)
    assert np.all(np.asarray(nd) >= -1e-4) and np.all(np.asarray(nd) <= 1 + 1e-4)


def test_pack_modes_agree(rng):
    """4/2/1-corner packings produce identical samples (incl. OOB)."""
    from itermvs_tpu.ops.grid_sample import gather_bilinear, pack_corners

    src = rng.rand(2, 11, 17, 8).astype(np.float32)
    grid = (rng.rand(2, 9, 13, 2).astype(np.float32) * 3.0 - 1.5)
    px = (grid[..., 0] + 1.0) * 0.5 * (17 - 1)
    py = (grid[..., 1] + 1.0) * 0.5 * (11 - 1)
    src_j, px_j, py_j = jnp.asarray(src), jnp.asarray(px), jnp.asarray(py)
    outs = [np.asarray(gather_bilinear(pack_corners(src_j, corners=k),
                                       px_j, py_j))
            for k in (4, 2, 1)]
    np.testing.assert_allclose(outs[1], outs[0], atol=1e-6)
    np.testing.assert_allclose(outs[2], outs[0], atol=1e-6)
    # and the adaptive default matches too
    auto = np.asarray(gather_bilinear(pack_corners(src_j), px_j, py_j))
    np.testing.assert_allclose(auto, outs[0], atol=1e-6)


def test_banded_gather_matches_single_table(rng, monkeypatch):
    """Row-banded tables (the fast-gather row-limit split) must produce
    exactly the single-table warp + correlation."""
    import sys

    import itermvs_tpu.ops.grid_sample  # noqa: F401
    gs = sys.modules["itermvs_tpu.ops.grid_sample"]
    from itermvs_tpu.ops.warping import warp_corr, warp_corr_packed

    b, c, g, n = 1, 16, 8, 3
    h = w = h1 = w1 = 12
    src = rng.rand(b, h1, w1, c).astype(np.float32)
    ref_fea = rng.rand(b, h, w, c).astype(np.float32)
    proj = np.eye(4, dtype=np.float32)[None]
    proj[0, 0, 3] = 0.3
    depth = rng.uniform(2, 4, (b, n, h, w)).astype(np.float32)

    base = np.asarray(warp_corr(jnp.asarray(src), jnp.asarray(ref_fea),
                                jnp.asarray(proj), jnp.asarray(depth), g))
    # Force banding with a tiny row limit (table has 144 rows -> 3 bands;
    # superpixel packing off — it would otherwise win this size class).
    monkeypatch.setattr(gs, "SUPERPIXEL_PACKING", False)
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", 50)
    banded = gs.pack_corners_fast(jnp.asarray(src))
    assert isinstance(banded, gs.BandedSource) and len(banded.bands) == 3
    got = np.asarray(warp_corr_packed(banded, jnp.asarray(ref_fea),
                                      jnp.asarray(proj), jnp.asarray(depth), g))
    np.testing.assert_allclose(got, base, atol=1e-6)


def test_sample_banded_gather_batch(rng, monkeypatch):
    """Batch > 1 tables split on sample boundaries (each sample's
    indices gather only from its own bands) must match the unbanded
    flat-table gather exactly — including out-of-range coordinates."""
    import sys

    import itermvs_tpu.ops.grid_sample  # noqa: F401
    gs = sys.modules["itermvs_tpu.ops.grid_sample"]

    b, h, w, c = 3, 20, 30, 8
    src = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    px = jnp.asarray(rng.uniform(-3, w + 2, (b, 5, h, w)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-3, h + 2, (b, 5, h, w)).astype(np.float32))
    ref = np.asarray(gs.gather_bilinear(gs.pack_corners(src), px, py))

    monkeypatch.setattr(gs, "SUPERPIXEL_PACKING", False)
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", 500)
    banded = gs.pack_corners_fast(src)
    assert isinstance(banded, gs.BandedSource)
    assert sorted(set(banded.sample_ids)) == [0, 1, 2]
    assert len(banded.bands) == 6          # 600 rows/sample -> 2 bands
    got = np.asarray(gs.gather_bilinear(banded, px, py))
    np.testing.assert_allclose(got, ref, atol=1e-6)

    # Single-band-per-sample case (batch split only, no within-sample
    # bands, no masking passes).
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", 1000)
    banded1 = gs.pack_corners_fast(src)
    assert isinstance(banded1, gs.BandedSource)
    assert len(banded1.bands) == 3
    got1 = np.asarray(gs.gather_bilinear(banded1, px, py))
    np.testing.assert_allclose(got1, ref, atol=1e-6)


def test_superpixel_gather_matches_packed(rng, monkeypatch):
    """The 2×2-superpixel 9-slot packing (chosen when a sample's H·W
    exceeds the fast-gather row limit but the superpixel table fits)
    must be BIT-equal to the flat corner-packed gather: the four tap
    products scatter to parity-selected slots with exact 1/0 factors
    and the accumulation order is unchanged."""
    import sys

    import itermvs_tpu.ops.grid_sample  # noqa: F401
    gs = sys.modules["itermvs_tpu.ops.grid_sample"]

    for b, h, w, c in ((1, 20, 30, 8), (3, 21, 17, 16)):   # odd sizes too
        src = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
        px = jnp.asarray(rng.uniform(-3, w + 2, (b, 5, h, w)).astype(np.float32))
        py = jnp.asarray(rng.uniform(-3, h + 2, (b, 5, h, w)).astype(np.float32))
        ref = np.asarray(gs.gather_bilinear(gs.pack_corners(src), px, py))
        monkeypatch.setattr(gs, "PAIR_PACKING", False)   # pair wins otherwise
        monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", h * w - 1)
        sp = gs.pack_corners_fast(src)
        assert isinstance(sp, gs.SuperpixelSource)
        got = np.asarray(gs.gather_bilinear(sp, px, py))
        np.testing.assert_array_equal(got, ref)

    # bfloat16 tables stay bit-equal too (weights applied in table dtype).
    src = jnp.asarray(rng.rand(1, 30, 40, 16).astype(np.float32)
                      ).astype(jnp.bfloat16)
    px = jnp.asarray(rng.uniform(-2, 41, (1, 3, 30, 40)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-2, 31, (1, 3, 30, 40)).astype(np.float32))
    ref = np.asarray(gs.gather_bilinear(gs.pack_corners(src), px, py)
                     .astype(jnp.float32))
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", 1199)
    sp = gs.pack_corners_fast(src)
    assert isinstance(sp, gs.SuperpixelSource)
    got = np.asarray(gs.gather_bilinear(sp, px, py).astype(jnp.float32))
    np.testing.assert_array_equal(got, ref)

    # Fallback: when even the superpixel table exceeds the limit the
    # pack stays banded.
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", 100)
    assert isinstance(gs.pack_corners_fast(src), gs.BandedSource)


def test_superpixel_warp_corr_matches(rng, monkeypatch):
    """warp_corr on a SuperpixelSource (through fused taps + group corr,
    the in-model path) matches the unbanded packed source."""
    import sys

    import itermvs_tpu.ops.grid_sample  # noqa: F401
    gs = sys.modules["itermvs_tpu.ops.grid_sample"]
    from itermvs_tpu.ops.warping import warp_corr, warp_corr_packed

    b, c, g, n = 2, 16, 8, 3
    h = w = 12
    src = rng.rand(b, h, w, c).astype(np.float32)
    ref_fea = rng.rand(b, h, w, c).astype(np.float32)
    proj = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    proj[:, 0, 3] = 0.3
    depth = rng.uniform(2, 4, (b, n, h, w)).astype(np.float32)

    base = np.asarray(warp_corr(jnp.asarray(src), jnp.asarray(ref_fea),
                                jnp.asarray(proj), jnp.asarray(depth), g))
    monkeypatch.setattr(gs, "PAIR_PACKING", False)       # pair wins otherwise
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", h * w - 1)
    sp = gs.pack_corners_fast(jnp.asarray(src))
    assert isinstance(sp, gs.SuperpixelSource)
    got = np.asarray(warp_corr_packed(sp, jnp.asarray(ref_fea),
                                      jnp.asarray(proj), jnp.asarray(depth), g))
    np.testing.assert_allclose(got, base, atol=1e-6)


def test_pair_gather_matches_packed(rng, monkeypatch):
    """The 1×2-pair 6-slot packing (preferred when a sample's H·W
    exceeds the fast-gather row limit and the half-width pair table
    fits) must be BIT-equal to the flat corner-packed gather: the four
    tap products scatter to x-parity-selected slots with exact 1/0
    factors and the accumulation order is unchanged."""
    import sys

    import itermvs_tpu.ops.grid_sample  # noqa: F401
    gs = sys.modules["itermvs_tpu.ops.grid_sample"]

    # Packing/gather math parity, including odd sizes and batch > 1
    # (pack_pair directly: the gate itself only ever picks pair at
    # batch 1 — see below).
    for b, h, w, c in ((1, 20, 30, 8), (3, 21, 17, 16)):
        src = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
        px = jnp.asarray(rng.uniform(-3, w + 2, (b, 5, h, w)).astype(np.float32))
        py = jnp.asarray(rng.uniform(-3, h + 2, (b, 5, h, w)).astype(np.float32))
        ref = np.asarray(gs.gather_bilinear(gs.pack_corners(src), px, py))
        pr = gs.pack_pair(src)
        assert pr.data.shape == (b, h, -(-w // 2), 6 * c)
        got = np.asarray(gs.gather_bilinear(pr, px, py))
        np.testing.assert_array_equal(got, ref)

    # Gate: a batch-1 oversized sample whose half-width pair table fits
    # arrives as a PairSource. (At batch >= 2 the pair table B*H*ceil(W/2)
    # always exceeds the oversize threshold H*W, so the gate falls
    # through to superpixel/banded — pair is the eval batch-1 case.)
    b, h, w, c = 1, 20, 30, 8
    src = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    px = jnp.asarray(rng.uniform(-3, w + 2, (b, 5, h, w)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-3, h + 2, (b, 5, h, w)).astype(np.float32))
    ref = np.asarray(gs.gather_bilinear(gs.pack_corners(src), px, py))
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", h * w - 1)
    pr = gs.pack_corners_fast(src)
    assert isinstance(pr, gs.PairSource)
    got = np.asarray(gs.gather_bilinear(pr, px, py))
    np.testing.assert_array_equal(got, ref)
    src3 = jnp.asarray(rng.rand(3, 21, 17, 16).astype(np.float32))
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", 21 * 17 - 1)
    assert isinstance(gs.pack_corners_fast(src3), gs.SuperpixelSource)

    # bfloat16 tables stay bit-equal too (weights applied in table dtype).
    src = jnp.asarray(rng.rand(1, 30, 40, 16).astype(np.float32)
                      ).astype(jnp.bfloat16)
    px = jnp.asarray(rng.uniform(-2, 41, (1, 3, 30, 40)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-2, 31, (1, 3, 30, 40)).astype(np.float32))
    ref = np.asarray(gs.gather_bilinear(gs.pack_corners(src), px, py)
                     .astype(jnp.float32))
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", 1199)
    pr = gs.pack_corners_fast(src)
    assert isinstance(pr, gs.PairSource)
    got = np.asarray(gs.gather_bilinear(pr, px, py).astype(jnp.float32))
    np.testing.assert_array_equal(got, ref)

    # Fallbacks: pair table over the limit -> superpixel; superpixel
    # over too -> banded; ITERMVS_PAIR=0 -> superpixel where pair fits.
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", 550)   # 600 > 550 >= 300
    assert isinstance(gs.pack_corners_fast(src), gs.SuperpixelSource)
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", 100)
    assert isinstance(gs.pack_corners_fast(src), gs.BandedSource)
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", 1199)
    monkeypatch.setattr(gs, "PAIR_PACKING", False)
    assert isinstance(gs.pack_corners_fast(src), gs.SuperpixelSource)


def test_pair_warp_corr_matches(rng, monkeypatch):
    """warp_corr on a PairSource (through fused taps + group corr, the
    in-model path) matches the unbanded packed source."""
    import sys

    import itermvs_tpu.ops.grid_sample  # noqa: F401
    gs = sys.modules["itermvs_tpu.ops.grid_sample"]
    from itermvs_tpu.ops.warping import warp_corr, warp_corr_packed

    b, c, g, n = 1, 16, 8, 3       # pair engages at batch 1 (see gate)
    h = w = 12
    src = rng.rand(b, h, w, c).astype(np.float32)
    ref_fea = rng.rand(b, h, w, c).astype(np.float32)
    proj = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    proj[:, 0, 3] = 0.3
    depth = rng.uniform(2, 4, (b, n, h, w)).astype(np.float32)

    base = np.asarray(warp_corr(jnp.asarray(src), jnp.asarray(ref_fea),
                                jnp.asarray(proj), jnp.asarray(depth), g))
    monkeypatch.setattr(gs, "FAST_GATHER_MAX_ROWS", h * w - 1)
    pr = gs.pack_corners_fast(jnp.asarray(src))
    assert isinstance(pr, gs.PairSource)
    got = np.asarray(warp_corr_packed(pr, jnp.asarray(ref_fea),
                                      jnp.asarray(proj), jnp.asarray(depth), g))
    np.testing.assert_allclose(got, base, atol=1e-6)


def test_fused_sweep_taps_matches_per_level(rng):
    """The fused [B,V,N,H,W] multi-level tap chain must reproduce the
    per-(view, level) warp+corr path (same per-element operations, so
    agreement is to f32 fusion noise)."""
    from itermvs_tpu.ops.grid_sample import gather_corners
    from itermvs_tpu.ops.warping import (
        fused_sweep_taps, group_corr, pack_bilinear, relative_projection,
        warp_corr_packed)

    b, v, h, w, groups = 2, 3, 12, 16, 8
    counts = (4, 4, 2)
    # level sizes: level1 = 2x grid, level2 = grid, level3 = grid/2
    src_hws = ((h * 2, w * 2), (h, w), (h // 2, w // 2))
    chans = (16, 32, 48)
    feats = [
        [rng.rand(b, sh, sw, c).astype(np.float32)
         for _ in range(v)]
        for (sh, sw), c in zip(src_hws, chans)
    ]
    rel = []
    for (sh, sw) in src_hws:
        ref_p = np.stack([_random_camera(rng, sw, sh) for _ in range(b)])
        srcs = np.stack(
            [[_random_camera(rng, sw, sh, tz=0.1) for _ in range(v)]
             for _ in range(b)])
        rel.append(np.asarray(relative_projection(
            jnp.asarray(srcs), jnp.asarray(ref_p[:, None]))))
    rel = np.stack(rel, axis=2)                    # [B, V, L, 4, 4]
    samples = rng.uniform(2.0, 8.0, (b, sum(counts), h, w)).astype(np.float32)
    refs = [rng.rand(b, h, w, c).astype(np.float32) for c in chans]

    packed = [[pack_bilinear(jnp.asarray(f)) for f in level] for level in feats]
    level_of_sample = (0,) * 4 + (1,) * 4 + (2,) * 2
    flat_idx, taps = fused_sweep_taps(
        jnp.asarray(rel), jnp.asarray(samples), level_of_sample, src_hws,
        jnp.float32)

    off = 0
    for li, n in enumerate(counts):
        c = chans[li]
        for vi in range(v):
            want = warp_corr_packed(
                packed[li][vi], jnp.asarray(refs[li]),
                jnp.asarray(rel[:, vi, li]),
                jnp.asarray(samples[:, off:off + n]), groups)
            got = group_corr(
                gather_corners(
                    packed[li][vi],
                    flat_idx[:, vi, off:off + n].reshape(b, -1),
                    *[t[:, vi, off:off + n].reshape(b, -1) for t in taps],
                ).reshape(b, n, h, w, c),
                jnp.asarray(refs[li]), groups)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)
        off += n


def test_chunked_warp_corr_matches_single_chunk(rng, monkeypatch):
    """Sample-chunked gather+corr (models/itermvs.py:chunked_warp_corr,
    engaged when a sweep's gather output exceeds FAST_GATHER_MAX_ROWS,
    e.g. 1600x1152 level 1/2 and every init sweep) is exact: per-sample
    gather -> taps -> f32 group mean is independent, so chunk + concat
    must equal the single-chunk evaluation bit-for-bit."""
    from itermvs_tpu.models import itermvs as m
    from itermvs_tpu.ops.grid_sample import pack_corners

    b, n, h, w, c = 2, 6, 12, 16, 16
    h1, w1 = 24, 32
    src = jnp.asarray(rng.rand(b, h1, w1, c).astype(np.float32))
    ref = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    packed = pack_corners(src)
    flat_idx = jnp.asarray(
        rng.randint(0, h1 * w1, size=(b, n, h * w)).astype(np.int32))
    taps = [jnp.asarray(rng.rand(b, n, h * w).astype(np.float32))
            for _ in range(4)]

    single = m.chunked_warp_corr(packed, ref, flat_idx, taps,
                                 (n, h, w, c), m.GROUPS)
    # Force chunking at this tiny shape: limit < n*h*w but >= h*w.
    monkeypatch.setattr(m, "FAST_GATHER_MAX_ROWS", 2 * h * w)
    chunked = m.chunked_warp_corr(packed, ref, flat_idx, taps,
                                  (n, h, w, c), m.GROUPS)
    assert single.shape == chunked.shape == (b, n, h, w, m.GROUPS)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(chunked))


def test_chunked_warp_corr_row_budget_counts_batch(rng, monkeypatch):
    """The chunk size must bound EMITTED rows b*chunk*h*w, not
    chunk*h*w: a batch-4 training sweep that sized chunks per-sample
    would emit 4x the budget per gather and lose the epilogue fusion
    chunking exists to keep (models/itermvs.py:chunked_warp_corr)."""
    from itermvs_tpu.models import itermvs as m
    from itermvs_tpu.ops.grid_sample import pack_corners

    b, n, h, w, c = 3, 8, 8, 8, 16
    h1, w1 = 16, 16
    hw = h * w
    src = jnp.asarray(rng.rand(b, h1, w1, c).astype(np.float32))
    ref = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    packed = pack_corners(src)
    flat_idx = jnp.asarray(
        rng.randint(0, h1 * w1, size=(b, n, hw)).astype(np.int32))
    taps = [jnp.asarray(rng.rand(b, n, hw).astype(np.float32))
            for _ in range(4)]

    limit = 4 * b * hw          # fits 4 samples ACROSS the batch
    monkeypatch.setattr(m, "FAST_GATHER_MAX_ROWS", limit)
    real_gather = m.gather_corners
    seen = []

    def spy(packed_, idx, *tap_args):
        seen.append(idx.shape[0] * idx.shape[1])
        return real_gather(packed_, idx, *tap_args)

    monkeypatch.setattr(m, "gather_corners", spy)
    out = m.chunked_warp_corr(packed, ref, flat_idx, taps,
                              (n, h, w, c), m.GROUPS)
    assert out.shape == (b, n, h, w, m.GROUPS)
    assert seen and all(rows <= limit for rows in seen), seen
    assert len(seen) == 2       # 8 samples / 4-per-chunk
