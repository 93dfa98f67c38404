"""One-off experiment: forward throughput vs --xla_tpu_scoped_vmem_limit_kib.

Usage: python -m tools.exp_vmem [limit_kib ...]   (0 = default options)
Env: ITERMVS_PROF_WH, ITERMVS_PROF_BATCH as in profile_trace.
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

from itermvs_tpu.utils import enable_persistent_cache


def main():
    enable_persistent_cache()
    from itermvs_tpu.models import Pipeline
    from __graft_entry__ import _example_inputs

    wh = os.environ.get("ITERMVS_PROF_WH", "1152x864")
    width, height = (int(v) for v in wh.split("x"))
    batch = int(os.environ.get("ITERMVS_PROF_BATCH", "1"))
    views = 5
    imgs, projs, dmin, dmax = _example_inputs(batch, views, height, width)
    model = Pipeline(iteration=4, test=True, dtype=jnp.bfloat16)
    init_in = _example_inputs(1, views, 96, 128)
    variables = model.init(jax.random.PRNGKey(0), *init_in)

    def fwd(imgs, projs, dmin, dmax):
        out = model.apply(variables, imgs, projs, dmin, dmax)
        return out["depths_upsampled"], out["confidence_upsampled"]

    limits = [int(a) for a in sys.argv[1:]] or [0, 32768, 65536, 98304]
    lowered = jax.jit(fwd).lower(imgs, projs, dmin, dmax)
    for limit in limits:
        opts = ({"xla_tpu_scoped_vmem_limit_kib": str(limit)} if limit else None)
        try:
            compiled = lowered.compile(compiler_options=opts)
        except Exception as e:
            print(f"limit={limit}: compile failed: {repr(e)[:200]}")
            continue
        out = compiled(imgs, projs, dmin, dmax)
        jax.block_until_ready(out)
        iters = 12
        start = time.perf_counter()
        for _ in range(iters):
            out = compiled(imgs, projs, dmin, dmax)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - start) / iters
        print(f"limit={limit:7d} kib: {dt * 1e3:7.2f} ms/call "
              f"({batch / dt:.2f} maps/s aggregate)")


if __name__ == "__main__":
    main()
