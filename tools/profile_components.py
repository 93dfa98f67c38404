"""Per-component timing on the current device (dev tool).

Times FeatureNet, one init-branch warp_corr (N=32 @1/8), one iteration
warp_corr per level, CorrNet, full Evaluation.init_sweep, Update, and
the full Pipeline, all at the paper's DTU eval setting 1152x864 / N=5.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - start) / iters
    print(f"{name:45s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    from itermvs_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    from itermvs_tpu.models import Pipeline
    from itermvs_tpu.models.feature_net import FeatureNet
    from itermvs_tpu.ops.warping import warp_corr
    from __graft_entry__ import _example_inputs

    width, height, views = 1152, 864, 5
    imgs, projs, dmin, dmax = _example_inputs(1, views, height, width)

    model = Pipeline(iteration=4, test=True)
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dmin, dmax)

    @jax.jit
    def forward(imgs, projs, dmin, dmax):
        out = model.apply(variables, imgs, projs, dmin, dmax)
        return out["depths_upsampled"], out["confidence_upsampled"]

    total = timeit("full pipeline", forward, imgs, projs, dmin, dmax)

    # FeatureNet alone on the folded batch.
    fnet = FeatureNet()
    x = imgs["level_0"].reshape(views, height, width, 3)
    fvars = {"params": variables["params"]["feature_net"],
             "batch_stats": variables["batch_stats"]["feature_net"]}
    fapply = jax.jit(lambda x: fnet.apply(fvars, x))
    timeit("feature_net (V=5 folded)", fapply, x)

    rng = np.random.RandomState(0)
    h8, w8 = height // 8, width // 8
    h4, w4 = height // 4, width // 4

    def mk(shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32))

    proj = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (1, 1, 1)))

    # Init-branch warp+corr: one view, 32 depths @ 1/8, C=48.
    src3 = mk((1, h8, w8, 48))
    ref3 = mk((1, h8, w8, 48))
    d32 = mk((1, 32, h8, w8)) * 5 + 3
    wc = jax.jit(lambda s, r, p, d: warp_corr(s, r, p, d, 8))
    timeit("warp_corr init (N=32 @1/8 C=48) x1 view", wc, src3, ref3, proj, d32)

    # Iteration warps at 1/4 grid.
    src1 = mk((1, height // 2, width // 2, 16))
    ref1 = mk((1, h4, w4, 16))
    d4 = mk((1, 4, h4, w4)) * 5 + 3
    timeit("warp_corr iter L1 (N=4 @1/4 C=16) x1 view", wc, src1, ref1, proj, d4)

    src2 = mk((1, h4, w4, 32))
    ref2 = mk((1, h4, w4, 32))
    timeit("warp_corr iter L2 (N=4 @1/4 C=32) x1 view", wc, src2, ref2, proj, d4)

    src3b = mk((1, h8, w8, 48))
    ref3b = mk((1, h4, w4, 48))
    d2 = mk((1, 2, h4, w4)) * 5 + 3
    timeit("warp_corr iter L3 (N=2 @1/4 C=48) x1 view", wc, src3b, ref3b, proj, d2)

    # CorrNet on iteration-branch input.
    from itermvs_tpu.models.itermvs import CorrNet
    cnet = CorrNet()
    corr_in = mk((1, 4, h4, w4, 8))
    cvars = cnet.init(jax.random.PRNGKey(0), corr_in)
    capply = jax.jit(lambda c: cnet.apply(cvars, c))
    timeit("corr_net (N=4 @1/4)", capply, corr_in)

    print(f"\ntotal: {total * 1e3:.1f} ms -> {1 / total:.2f} maps/s")


if __name__ == "__main__":
    main()
