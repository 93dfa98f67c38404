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
    from itermvs_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    from itermvs_tpu.models import Pipeline
    from __graft_entry__ import _example_inputs

    width, height, views = 1152, 864, 5
    imgs, projs, dmin, dmax = _example_inputs(1, views, height, width)
    model = Pipeline(iteration=4, test=True)
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dmin, dmax)

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

    # Aggregate complete events on device tracks by name.
    totals = collections.Counter()
    counts = collections.Counter()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)  # microseconds
        args = ev.get("args") or {}
        # Keep only device (TensorCore) events: they carry run ids/hlo info.
        if "run_id" in args or "hlo_op" in args or "correlation_id" in args:
            key = name
        else:
            key = None
        if key:
            totals[key] += dur
            counts[key] += 1

    if not totals:  # fallback: aggregate everything phase-X
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "X":
                totals[ev.get("name", "?")] += ev.get("dur", 0)
                counts[ev.get("name", "?")] += 1

    grand = sum(totals.values())
    print(f"total device-event time: {grand / 1e3:.1f} ms over 3 steps\n")
    for name, dur in totals.most_common(45):
        print(f"{dur / 1e3 / 3:9.3f} ms/step  x{counts[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
