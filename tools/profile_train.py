"""Op-level trace of one training step (dev tool).

DTU recipe shapes: 640x512, batch 2, N=5 views, iteration=4, regress.
Prints the top device ops — watch for the gather backward (scatter-add)
and conv backward costs.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from itermvs_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    from itermvs_tpu.models import Pipeline
    from itermvs_tpu.engine.train_loop import (
        create_train_state, make_optimizer, make_train_step)
    from __graft_entry__ import _example_inputs

    batch = int(os.environ.get("ITERMVS_PROF_BATCH", "2"))
    views, height, width = 5, 512, 640
    imgs, projs, dmin, dmax = _example_inputs(batch, views, height, width)
    rng = np.random.RandomState(0)
    depth, mask = {}, {}
    for lvl in range(4):
        h, w = height >> lvl, width >> lvl
        depth[f"level_{lvl}"] = jnp.asarray(
            rng.uniform(3, 8, (batch, h, w, 1)).astype(np.float32))
        mask[f"level_{lvl}"] = jnp.asarray(
            (rng.rand(batch, h, w, 1) > 0.2).astype(np.float32))

    dtype = jnp.dtype(os.environ.get("ITERMVS_PROF_DTYPE", "float32"))
    print(f"train step profile: batch={batch} dtype={dtype}")
    model = Pipeline(iteration=4, test=False, dtype=dtype)
    # Init at a tiny shape — parameters are resolution-independent.
    init_in = _example_inputs(1, views, 64, 96)
    variables = model.init(jax.random.PRNGKey(0), *init_in, train=False)
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, regress=True, num_iters=4, mesh=None)

    batch_data = {"imgs": imgs, "proj_matrices": projs, "depth": depth,
                  "mask": mask, "depth_min": dmin, "depth_max": dmax}
    state, scalars = step(state, batch_data, jnp.float32(1e-3))
    float(scalars["loss"])

    # Sync by FETCHING the loss each step: with donate_argnums on the
    # step, block_until_ready on outputs returns early on this runtime
    # (donated-alias buffers report ready; measured 40x off).
    import time
    t0 = time.perf_counter()
    for _ in range(5):
        state, scalars = step(state, batch_data, jnp.float32(1e-3))
        float(scalars["loss"])
    print(f"step time: {(time.perf_counter() - t0) / 5 * 1e3:.1f} ms", flush=True)

    tracedir = tempfile.mkdtemp(prefix="train_trace_")
    with jax.profiler.trace(tracedir):
        state, scalars = step(state, batch_data, jnp.float32(1e-3))
        jax.block_until_ready(scalars["loss"])

    paths = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                      recursive=True)
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    tracks = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            tracks[ev.get("pid")] = (ev.get("args") or {}).get("name", "?")
    import re

    totals = collections.Counter()
    counts = collections.Counter()
    cats = collections.Counter()
    for ev in trace.get("traceEvents", []):
        if (ev.get("ph") != "X"
                or "TPU" not in str(tracks.get(ev.get("pid"), ""))):
            continue
        name = ev.get("name", "?")
        if name.startswith("jit_") or name == "1":
            continue
        cats[name.split(".")[0]] += ev.get("dur", 0)
        long = str((ev.get("args") or {}).get("long_name") or name)
        key = re.sub(r"\.\d+", "", long)[:130]
        totals[key] += ev.get("dur", 0)
        counts[key] += 1
    print(f"device total: {sum(cats.values()) / 1e3:.1f} ms/step\n")
    for base, dur in cats.most_common(12):
        print(f"  {base:26s} {dur / 1e3:8.2f} ms/step")
    print()
    for name, dur in totals.most_common(40):
        print(f"{dur / 1e3:9.3f} ms  x{counts[name]:3d}  {name[:120]}")


if __name__ == "__main__":
    main()
