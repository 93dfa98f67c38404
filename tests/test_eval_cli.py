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
