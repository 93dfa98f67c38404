"""Op-level XLA trace of the test-mode pipeline (dev tool).

Captures a jax.profiler device trace of a few forward steps, then
parses the perfetto trace.json.gz to print the top ops by total device
time — the definitive breakdown of where the 1152x864 forward goes.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile

import jax


def main():
    import os as _os

    from itermvs_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    from itermvs_tpu.models import Pipeline
    from __graft_entry__ import _example_inputs

    # Env overrides: ITERMVS_PROF_WH=1600x1152  ITERMVS_PROF_S2D=1
    #                ITERMVS_PROF_DTYPE=float32
    wh = _os.environ.get("ITERMVS_PROF_WH", "1152x864")
    width, height = (int(v) for v in wh.split("x"))
    views = int(_os.environ.get("ITERMVS_PROF_VIEWS", "5"))
    batch = int(_os.environ.get("ITERMVS_PROF_BATCH", "1"))
    s2d = _os.environ.get("ITERMVS_PROF_S2D", "0") == "1"
    imgs, projs, dmin, dmax = _example_inputs(batch, views, height, width)
    import jax.numpy as jnp

    dtype = jnp.dtype(_os.environ.get("ITERMVS_PROF_DTYPE", "bfloat16"))
    print(f"profiling {width}x{height} B={batch} V={views} dtype={dtype} s2d={s2d}")
    model = Pipeline(iteration=4, test=True, dtype=dtype, s2d_stem=s2d)
    # Init at a tiny shape (params are resolution-independent) — skips a
    # full-size init compile per profiled resolution.
    init_in = _example_inputs(1, views, 96, 128)
    variables = model.init(jax.random.PRNGKey(0), *init_in)

    @jax.jit
    def forward(imgs, projs, dmin, dmax):
        out = model.apply(variables, imgs, projs, dmin, dmax)
        return out["depths_upsampled"], out["confidence_upsampled"]

    jax.block_until_ready(forward(imgs, projs, dmin, dmax))

    tracedir = tempfile.mkdtemp(prefix="itermvs_trace_")
    with jax.profiler.trace(tracedir):
        for _ in range(3):
            out = forward(imgs, projs, dmin, dmax)
        jax.block_until_ready(out)

    paths = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {tracedir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    import re

    # Track (pid/tid) names from metadata events.
    tracks = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            tracks[ev.get("pid")] = (ev.get("args") or {}).get("name", "?")

    # Aggregate TPU ops: by category (op-name prefix) and by canonical
    # HLO long_name (op ids stripped so repeated identical ops merge).
    cats = collections.Counter()
    ops = collections.Counter()
    counts = collections.Counter()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if "TPU" not in tracks.get(ev.get("pid"), ""):
            continue
        name = ev.get("name", "?")
        if name.startswith("jit_"):
            continue
        cats[name.split(".")[0]] += ev.get("dur", 0)
        long = str((ev.get("args") or {}).get("long_name") or name)
        key = re.sub(r"\.\d+", "", long)[:130]
        ops[key] += ev.get("dur", 0)
        counts[key] += 1

    steps = 3
    print(f"device total: {sum(cats.values()) / 1e3 / steps:.1f} ms/step\n")
    print("-- by category (op-name prefix) --")
    for base, dur in cats.most_common(12):
        print(f"  {base:26s} {dur / 1e3 / steps:8.2f} ms/step")
    top = int(_os.environ.get("ITERMVS_PROF_TOP", "40"))
    only = _os.environ.get("ITERMVS_PROF_ONLY")  # substring filter, e.g. "copy"
    print("\n-- top ops (canonicalized HLO) --")
    shown = 0
    for key, dur in ops.most_common():
        if only and not key.startswith(only):
            continue
        print(f"{dur / 1e3 / steps:8.2f} ms/step x{counts[key]:4d}  {key[:130]}")
        shown += 1
        if shown >= top:
            break


if __name__ == "__main__":
    main()
