"""Parity of the fused Pallas sweep epilogue against its XLA oracle.

The kernel is a measured-and-rejected experiment on the current v5e
toolchain (see ops/sweep_epilogue.py STATUS) — these tests keep it
correct for re-evaluation. Runs in Pallas interpret mode (tests are
pinned to CPU by conftest); tools/exp_epilogue.py measures + re-checks
the compiled kernel on real TPU.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from itermvs_tpu.ops import sweep_epilogue
from itermvs_tpu.ops.sweep_epilogue import (
    corr_epilogue, corr_epilogue_reference, premultiply, supports)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Force pallas_call to interpret mode on the CPU test platform."""
    from jax.experimental import pallas as pl

    real = pl.pallas_call

    def fake(*args, **kwargs):
        kwargs["interpret"] = True
        return real(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", fake)
    # The jitted wrapper caches compiled programs keyed on static args
    # only — clear so the interpret flag takes effect.
    sweep_epilogue._epilogue_call.clear_cache()
    yield
    sweep_epilogue._epilogue_call.clear_cache()


@pytest.mark.parametrize("n,hw,c", [(4, 1536, 16), (2, 1536, 48),
                                    (8, 512, 32)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_corr_epilogue_matches_reference(n, hw, c, dtype, rng):
    premul = jnp.asarray(
        rng.rand(n * hw, 4 * c).astype(np.float32) * 2 - 1, dtype)
    assert supports(n * hw)
    got = corr_epilogue(premul, n, 8)
    want = corr_epilogue_reference(premul, n, 8)
    assert got.shape == (8, n, hw)
    tol = 5e-6 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=tol * float(jnp.abs(want).max()))


def test_premultiply_distributes_ref_over_corners(rng):
    """premultiply folds taps+ref so that corner-sum-then-group-mean of
    its output equals the original (corner-sum → ref product → mean)."""
    n, hw, c, g = 2, 64, 16, 8
    vals = rng.rand(n * hw, 4 * c).astype(np.float32)
    taps = [rng.rand(n * hw).astype(np.float32) for _ in range(4)]
    ref = rng.rand(hw, c).astype(np.float32)

    pre = np.asarray(premultiply(
        jnp.asarray(vals), [jnp.asarray(t) for t in taps],
        jnp.asarray(ref), n))
    got = np.asarray(corr_epilogue_reference(jnp.asarray(pre), n, g))

    # Original ordering: weighted corner sum, then ref product, then
    # per-group channel mean.
    v = vals.reshape(n * hw, 4, c)
    w = np.stack(taps, axis=1)[:, :, None]
    warped = (v * w).sum(axis=1).reshape(n, hw, c)
    prod = warped * ref[None]
    want = prod.reshape(n, hw, g, c // g).mean(-1).transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_supports_rejects_unblockable_sizes():
    assert supports(62208)
    assert supports(497664)
    assert not supports(7 * 11 * 13)
