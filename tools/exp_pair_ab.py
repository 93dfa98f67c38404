"""In-context A/B of the 1×2 pair packing (round 5).

Times the bench configuration's forward + feature-cached throughput at
1600×1152 (the only supported size where the level-1 table is oversized
and pair packing engages) with the current packing selection. Run twice:

    python -m tools.exp_pair_ab              # pair (default)
    ITERMVS_PAIR=0 python -m tools.exp_pair_ab   # superpixel fallback

1152×864 is reported as a control (no oversized tables at batch 1 —
both runs should match there).
"""
from __future__ import annotations

import os

from itermvs_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp


def main():
    from itermvs_tpu.models import Pipeline
    from itermvs_tpu.engine.checkpoint import load_variables, pretrained_path
    from bench import _throughput, _throughput_cached

    print(f"devices: {jax.devices()}  "
          f"ITERMVS_PAIR={os.environ.get('ITERMVS_PAIR', '1')}")
    model = Pipeline(iteration=4, test=True, dtype=jnp.bfloat16)
    variables = load_variables(pretrained_path("dtu"))

    @jax.jit
    def forward(imgs, projs, dmin, dmax):
        out = model.apply(variables, imgs, projs, dmin, dmax)
        return out["depths_upsampled"], out["confidence_upsampled"]

    for width, height in ((1600, 1152), (1152, 864)):
        m = _throughput(forward, width, height, views=5, iters=8)
        c = _throughput_cached(model, variables, width, height, 5, iters=8)
        print(f"{width}x{height}: uncached {m:6.3f} maps/s   "
              f"cached {c:6.3f} maps/s", flush=True)


if __name__ == "__main__":
    main()
