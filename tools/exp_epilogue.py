"""Probe: fused Pallas sweep epilogue vs the XLA gather->corr chain.

Times, per (level, view) shape of the 1152x864 / 1600x1152 sweeps:
  a) current: gather_corners (gather + corner sum) + group_corr
     (reshape + group mean) -> [1, n, H, W, G];
  b) fused:  raw gather with tap premultiply + corr_epilogue (Pallas)
     -> [G, n, HW].
Both consume identical tables/indices/taps; correctness is checked
against corr_epilogue_reference before timing.
"""
from __future__ import annotations

import os
import time

import numpy as np

from itermvs_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from itermvs_tpu.ops.grid_sample import PackedSource, gather_corners
from itermvs_tpu.ops.warping import group_corr
from itermvs_tpu.ops.sweep_epilogue import (
    corr_epilogue, corr_epilogue_reference, premultiply, supports)


def probe(name, h1, w1, c, n, h, w, dtype, iters=30):
    rng = np.random.RandomState(0)
    hw = h * w
    p = n * hw
    table = jnp.asarray(rng.rand(h1 * w1, 4 * c).astype(np.float32) * 2 - 1,
                        dtype)
    idx = jnp.asarray(rng.randint(0, h1 * w1, size=(1, p)), jnp.int32)
    taps = [jnp.asarray(rng.rand(1, p).astype(np.float32), dtype)
            for _ in range(4)]
    ref = jnp.asarray(rng.rand(1, h, w, c).astype(np.float32) * 2 - 1, dtype)
    packed = PackedSource(table.reshape(1, h1, w1, 4 * c), 4)

    REPS = 20

    def _loop(body):
        """Apply `body` REPS times inside one jit (per-iteration index
        shift defeats CSE/hoisting) — amortizes the host->device
        dispatch latency that dominates single-op timings here."""
        def f(packed, idx, taps, ref):
            def step(k, acc):
                out = body(packed, (idx + k) % (h1 * w1), taps, ref)
                return acc + out.sum()
            return jax.lax.fori_loop(0, REPS, step, jnp.float32(0.0))
        return jax.jit(f)

    def xla_body(packed, idx, taps, ref):
        warped = gather_corners(packed, idx, *taps).reshape(1, n, h, w, c)
        return group_corr(warped, ref, 8)

    def fused_body(packed, idx, taps, ref):
        flat = packed.data.reshape(-1, 4 * c)
        vals = jnp.take(flat, idx.reshape(-1), axis=0, mode="clip")
        pre = premultiply(vals, [t.reshape(-1) for t in taps],
                          ref.reshape(hw, c), n)
        return corr_epilogue(pre, n, 8)

    xla_chain = _loop(xla_body)
    fused = _loop(fused_body)

    a = jax.jit(xla_body)(packed, idx, taps, ref)
    b = jax.jit(fused_body)(packed, idx, taps, ref)
    want = corr_epilogue_reference(
        premultiply(jnp.take(table, idx.reshape(-1), axis=0, mode="clip"),
                    [t.reshape(-1) for t in taps], ref.reshape(hw, c), n),
        n, 8)
    err_b = float(jnp.max(jnp.abs(b - want)))
    a_gm = jnp.transpose(a[0], (3, 0, 1, 2)).reshape(8, n, hw)
    err_ab = float(jnp.max(jnp.abs(a_gm - b)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-9

    def bench(f):
        out = f(packed, idx, taps, ref)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(packed, idx, taps, ref)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * REPS) * 1e3

    ta = bench(xla_chain)
    tb = bench(fused)
    print(f"{name:28s} xla {ta:7.3f} ms   fused {tb:7.3f} ms   "
          f"({ta / tb:4.2f}x)  err(fused vs ref) {err_b / scale:.2e}  "
          f"err(xla vs fused) {err_ab / scale:.2e}")


def main():
    dt = jnp.dtype(os.environ.get("ITERMVS_PROF_DTYPE", "bfloat16"))
    print(f"dtype={dt}, supports(62208)={supports(62208)}")
    # 1152x864: H4=216, W4=288; level grids 432x576 / 216x288 / 108x144.
    probe("1152x864 L1 iter", 432, 576, 16, 4, 216, 288, dt)
    probe("1152x864 L2 iter", 216, 288, 32, 4, 216, 288, dt)
    probe("1152x864 L3 iter", 108, 144, 48, 2, 216, 288, dt)
    probe("1152x864 init (32x L3)", 108, 144, 48, 32, 108, 144, dt)
    # 1600x1152: H4=288, W4=400.
    probe("1600x1152 L2 iter", 288, 400, 32, 4, 288, 400, dt)
    probe("1600x1152 init", 144, 200, 48, 32, 144, 200, dt)


if __name__ == "__main__":
    main()
