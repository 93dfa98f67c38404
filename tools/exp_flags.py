"""One-off experiment: forward throughput under XLA compiler_options.

Usage: python -m tools.exp_flags 'flag=value;flag2=value2' 'flag3=v' ...
An empty-string arg compiles with default options (baseline).
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

    lowered = jax.jit(fwd).lower(imgs, projs, dmin, dmax)
    for spec in sys.argv[1:] or [""]:
        opts = None
        if spec:
            opts = dict(kv.split("=", 1) for kv in spec.split(";"))
        try:
            compiled = lowered.compile(compiler_options=opts)
        except Exception as e:
            print(f"[{spec or 'default'}]: compile failed: {repr(e)[:160]}")
            continue
        out = compiled(imgs, projs, dmin, dmax)
        jax.block_until_ready(out)
        iters = 12
        start = time.perf_counter()
        for _ in range(iters):
            out = compiled(imgs, projs, dmin, dmax)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - start) / iters
        print(f"[{spec or 'default'}]: {dt * 1e3:7.2f} ms/call "
              f"({batch / dt:.2f} maps/s)")


if __name__ == "__main__":
    main()
