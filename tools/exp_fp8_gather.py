"""Probe: row-gather rate and end-to-end sweep cost for fp8 tables.

Device traces show the sweep's row gathers running at ~90-140 GB/s of
effective random-access bandwidth (docs/PERFORMANCE.md round-4 notes),
i.e. partly BYTE-bound, not only row-count-bound. If so, halving table
bytes (bfloat16 -> float8_e4m3) should cut the ~27 ms/step gather cost
substantially. This measures:
  a) raw gather rate per table dtype at the sweep shapes;
  b) gather + convert-to-bf16 + corner-sum chain (the real consumer).
Quality impact of fp8 features is evaluated separately before any mode
ships (the correlation consumes quantized features).
"""
from __future__ import annotations

import time

import numpy as np

from itermvs_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

REPS = 20


def probe(name, rows_table, row_lanes, rows_out, dtype, iters=30):
    rng = np.random.RandomState(0)
    table = jnp.asarray(
        rng.rand(rows_table, row_lanes).astype(np.float32) * 2 - 1, dtype)
    idx = jnp.asarray(rng.randint(0, rows_table, size=rows_out), jnp.int32)
    taps = [jnp.asarray(rng.rand(rows_out).astype(np.float32), jnp.bfloat16)
            for _ in range(4)]
    c = row_lanes // 4

    def body(table, idx, k):
        v = jnp.take(table, (idx + k) % rows_table, axis=0, mode="clip")
        v = v.astype(jnp.bfloat16)
        return (v[:, 0 * c:1 * c] * taps[0][:, None]
                + v[:, 1 * c:2 * c] * taps[1][:, None]
                + v[:, 2 * c:3 * c] * taps[2][:, None]
                + v[:, 3 * c:4 * c] * taps[3][:, None])

    @jax.jit
    def loop(table, idx):
        return jax.lax.fori_loop(
            0, REPS,
            lambda k, acc: acc + body(table, idx, k).astype(jnp.float32).sum(),
            jnp.float32(0.0))

    out = loop(table, idx)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = loop(table, idx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (iters * REPS)
    gathered_mb = rows_out * row_lanes * table.dtype.itemsize / 1e6
    print(f"{name:34s} {dt * 1e3:7.3f} ms  {dt / rows_out * 1e9:5.2f} ns/row"
          f"  {gathered_mb / dt / 1e3:6.0f} GB/s gathered")


def main():
    for dt_name in ("bfloat16", "float8_e4m3fn", "int8"):
        dt = jnp.dtype(dt_name)
        print(f"--- table dtype {dt_name} ---")
        # 1152x864 shapes: (table rows, 4C lanes, output rows)
        probe("L1 iter  [248832,64] x248832", 248832, 64, 248832, dt)
        probe("L2 iter  [62208,128] x248832", 62208, 128, 248832, dt)
        probe("L3 iter  [15552,192] x124416", 15552, 192, 124416, dt)
        probe("init     [15552,192] x497664", 15552, 192, 497664, dt)
        # 1600x1152 level-1: above the banding limit in bf16 rows.
        probe("L1@1600 [460800,64] x460800", 460800, 64, 460800, dt)


if __name__ == "__main__":
    main()
