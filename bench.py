"""Benchmark: DTU depth-map inference throughput per chip.

Measures test-mode Pipeline throughput (depth maps/sec) at the paper's
DTU eval resolution 1152×864 with N=5 views, iteration=4, on the
default JAX device, in bfloat16 compute mode — the production TPU path
(convs/features/gather tables bf16; geometry, 256-bin softmax, depth
readout and heads float32). bf16 depth maps are quality-equivalent to
float32: with the released DTU checkpoint on a textured synthetic scene
the median relative depth difference vs float32 is 9e-5 and fused
point-cloud plane error is identical to 1e-4 (see tools/bf16_check.py
and the e2e verify flow); float32 remains the default for eval.py and
is bit-compared against the torch reference in tests.

Weights: the released DTU checkpoint when the reference mount is
present, else random init (throughput-identical).

Baseline: the IterMVS paper (arXiv 2112.05126, Tab. 4) reports 0.17 s
per view at 1152×864 on an RTX 2080Ti — 5.88 maps/sec. `vs_baseline`
is our maps/sec divided by that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_MAPS_PER_SEC = 1.0 / 0.17


def main():
    import jax
    import jax.numpy as jnp
    from itermvs_tpu.models import Pipeline
    from itermvs_tpu.utils import enable_persistent_cache
    from __graft_entry__ import _example_inputs

    enable_persistent_cache()

    width, height, views = 1152, 864, 5
    imgs, projs, dmin, dmax = _example_inputs(1, views, height, width)

    model = Pipeline(iteration=4, test=True, dtype=jnp.bfloat16)
    ckpt = "/root/reference/checkpoints/dtu/model_000015.ckpt"
    if os.path.exists(ckpt):
        from itermvs_tpu.engine.torch_import import import_torch_checkpoint

        variables = import_torch_checkpoint(ckpt)
    else:
        variables = model.init(jax.random.PRNGKey(0), imgs, projs, dmin, dmax)

    @jax.jit
    def forward(imgs, projs, dmin, dmax):
        out = model.apply(variables, imgs, projs, dmin, dmax)
        return out["depths_upsampled"], out["confidence_upsampled"]

    # Warmup / compile.
    d, c = forward(imgs, projs, dmin, dmax)
    jax.block_until_ready((d, c))

    iters = 12
    start = time.perf_counter()
    for _ in range(iters):
        d, c = forward(imgs, projs, dmin, dmax)
    jax.block_until_ready((d, c))
    elapsed = time.perf_counter() - start
    maps_per_sec = iters / elapsed

    print(json.dumps({
        "metric": "DTU depth maps/sec/chip (1152x864, N=5, iter=4, bf16)",
        "value": round(maps_per_sec, 3),
        "unit": "maps/sec",
        "vs_baseline": round(maps_per_sec / BASELINE_MAPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
