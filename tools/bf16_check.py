"""bf16 vs f32 pipeline: speed + depth-quality delta (dev tool)."""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from itermvs_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    from itermvs_tpu.models import Pipeline
    from __graft_entry__ import _example_inputs

    width, height, views = 1152, 864, 5
    imgs, projs, dmin, dmax = _example_inputs(1, views, height, width)

    results = {}
    for name, dt in [("float32", jnp.float32), ("bfloat16", jnp.bfloat16)]:
        model = Pipeline(iteration=4, test=True, dtype=dt)
        variables = model.init(jax.random.PRNGKey(0), imgs, projs, dmin, dmax)

        @jax.jit
        def forward(imgs, projs, dmin, dmax, model=model, variables=variables):
            out = model.apply(variables, imgs, projs, dmin, dmax)
            return out["depths_upsampled"], out["confidence_upsampled"]

        d, c = forward(imgs, projs, dmin, dmax)
        jax.block_until_ready((d, c))
        iters = 15
        t0 = time.perf_counter()
        for _ in range(iters):
            d, c = forward(imgs, projs, dmin, dmax)
        jax.block_until_ready((d, c))
        dtms = (time.perf_counter() - t0) / iters * 1e3
        results[name] = (dtms, np.asarray(d), np.asarray(c))
        print(f"{name}: {dtms:8.2f} ms ({1e3 / dtms:.2f} maps/s)", flush=True)

    d32, dbf = results["float32"][1], results["bfloat16"][1]
    rel = np.abs(dbf - d32) / np.maximum(d32, 1e-6)
    print(f"depth rel diff: median {np.median(rel):.2e} mean {rel.mean():.2e} "
          f"p99 {np.percentile(rel, 99):.2e}")
    c32, cbf = results["float32"][2], results["bfloat16"][2]
    print(f"confidence abs diff: median {np.median(np.abs(cbf - c32)):.2e}")


if __name__ == "__main__":
    main()
