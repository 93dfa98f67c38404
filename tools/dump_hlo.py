"""Dump optimized HLO of the test-mode forward for fusion identification."""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp


def main():
    from itermvs_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    from itermvs_tpu.models import Pipeline
    from __graft_entry__ import _example_inputs

    width, height, views = 1152, 864, 5
    imgs, projs, dmin, dmax = _example_inputs(1, views, height, width)
    model = Pipeline(iteration=4, test=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dmin, dmax)

    @jax.jit
    def forward(imgs, projs, dmin, dmax):
        out = model.apply(variables, imgs, projs, dmin, dmax)
        return out["depths_upsampled"], out["confidence_upsampled"]

    compiled = forward.lower(imgs, projs, dmin, dmax).compile()
    text = compiled.as_text()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/forward_hlo.txt"
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {len(text)} bytes to {out}")


if __name__ == "__main__":
    main()
