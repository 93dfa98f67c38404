"""eval.py CLI resolution rules (resolve_img_wh precedence).

Flag parity with the reference eval.py:31,47-53: named datasets pin
their published sizes, custom honors --img_wh (default 640 480). The
ITERMVS_IMG_WH env override must lose to an EXPLICITLY passed
--img_wh on custom — even when the passed value equals the default.
"""
import importlib

import pytest


@pytest.fixture(scope="module")
def eval_mod():
    return importlib.import_module("eval")


def _args(eval_mod, argv):
    return eval_mod.parser.parse_args(argv + ["--dataset", "custom"])


def test_img_wh_default(eval_mod, monkeypatch):
    monkeypatch.delenv("ITERMVS_IMG_WH", raising=False)
    assert eval_mod.resolve_img_wh(_args(eval_mod, [])) == (640, 480)


def test_img_wh_env_overrides_default(eval_mod, monkeypatch):
    monkeypatch.setenv("ITERMVS_IMG_WH", "320x256")
    assert eval_mod.resolve_img_wh(_args(eval_mod, [])) == (320, 256)


def test_img_wh_explicit_flag_beats_env(eval_mod, monkeypatch):
    monkeypatch.setenv("ITERMVS_IMG_WH", "320x256")
    args = _args(eval_mod, ["--img_wh", "800", "600"])
    assert eval_mod.resolve_img_wh(args) == (800, 600)


def test_img_wh_explicit_default_value_beats_env(eval_mod, monkeypatch):
    """Typing --img_wh 640 480 is still explicit: a stale env var must
    not silently change the geometry of an explicitly sized run."""
    monkeypatch.setenv("ITERMVS_IMG_WH", "320x256")
    args = _args(eval_mod, ["--img_wh", "640", "480"])
    assert eval_mod.resolve_img_wh(args) == (640, 480)


def test_img_wh_env_still_pins_named_datasets(eval_mod, monkeypatch):
    """Named datasets ignore --img_wh entirely (reference eval.py:47-51);
    the env var remains the only test-time size seam there."""
    monkeypatch.setenv("ITERMVS_IMG_WH", "320x256")
    args = eval_mod.parser.parse_args(
        ["--dataset", "dtu_yao_eval", "--img_wh", "800", "600"])
    assert eval_mod.resolve_img_wh(args) == (320, 256)


def test_img_wh_malformed_env_is_a_clear_error(eval_mod, monkeypatch):
    monkeypatch.setenv("ITERMVS_IMG_WH", "banana")
    with pytest.raises(SystemExit, match="ITERMVS_IMG_WH"):
        eval_mod.resolve_img_wh(_args(eval_mod, []))


def test_result_wire_roundtrip_error_bound(eval_mod):
    """uint16 result wire: dequantize(quantize(x)) must stay within one
    half quantization step of x — span/131070 for depth against each
    map's own range, 1/131070 for confidence — so the PFM outputs are
    provably inside every downstream fusion/scoring threshold."""
    import numpy as np

    rng = np.random.default_rng(0)
    b, h, w = 3, 17, 23
    # Per-map depth ranges mimicking DTU (425..935) plus a tiny-span map.
    depths = np.stack([
        rng.uniform(425.0, 935.0, (h, w)),
        rng.uniform(600.0, 601.0, (h, w)),
        np.full((h, w), 512.0),                # constant map: span guard
    ]).astype(np.float32)[..., None]
    confs = rng.uniform(0.0, 1.0, (b, h, w)).astype(np.float32)[..., None]

    wire = eval_mod.quantize_results(depths, confs)
    depth_q, lo, hi, conf_q = (np.asarray(x) for x in wire)
    assert depth_q.dtype == np.uint16 and conf_q.dtype == np.uint16
    d2, c2 = eval_mod.dequantize_results(depth_q, lo, hi, conf_q)

    span = depths[..., 0].max(axis=(1, 2)) - depths[..., 0].min(axis=(1, 2))
    # Half-step round-to-nearest bound, plus slack for the f32 scale math.
    bound = np.maximum(span, 1e-6) / 65535.0 * 0.501 + 1e-3
    err = np.abs(d2 - depths[..., 0]).max(axis=(1, 2))
    assert (err <= bound).all(), (err, bound)
    assert np.abs(c2 - confs[..., 0]).max() <= 0.501 / 65535.0 + 1e-7
