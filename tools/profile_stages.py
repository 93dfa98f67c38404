"""Staged pipeline timing: cost vs GRU iteration count (dev tool).

Times the jitted test-mode Pipeline at iteration = 1..4 at DTU eval
1152x864 / N=5. The slope gives the true per-iteration cost (iter_sweep
+ Update) inside the real graph; the intercept is features + init sweep
+ upsampling.
"""
from __future__ import annotations

import time

import jax


def main():
    from itermvs_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    from itermvs_tpu.models import Pipeline
    from __graft_entry__ import _example_inputs

    width, height, views = 1152, 864, 5
    imgs, projs, dmin, dmax = _example_inputs(1, views, height, width)

    times = {}
    for it in (1, 2, 3, 4):
        model = Pipeline(iteration=it, test=True)
        variables = model.init(jax.random.PRNGKey(0), imgs, projs, dmin, dmax)

        @jax.jit
        def forward(imgs, projs, dmin, dmax, model=model, variables=variables):
            out = model.apply(variables, imgs, projs, dmin, dmax)
            return out["depths_upsampled"], out["confidence_upsampled"]

        out = forward(imgs, projs, dmin, dmax)
        jax.block_until_ready(out)
        iters = 15
        t0 = time.perf_counter()
        for _ in range(iters):
            out = forward(imgs, projs, dmin, dmax)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        times[it] = dt
        print(f"iteration={it}: {dt * 1e3:8.2f} ms", flush=True)

    slope = (times[4] - times[1]) / 3
    print(f"\nper-GRU-iteration cost: {slope * 1e3:.2f} ms")
    print(f"features+init+upsample intercept: {(times[1] - slope) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
