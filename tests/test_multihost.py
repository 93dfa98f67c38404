"""Multi-host data parallelism: 2 real processes over a CPU cluster.

Validates the per-host input-sharding contract end to end:
loader slices the global batch per process → shard_batch assembles the
global array from process-local shards → a global reduction sees every
sample exactly once (see tests/multihost_worker.py).
"""
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_cluster():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen([sys.executable, worker, str(p), str(port)],
                         cwd=repo, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for p in range(2)
    ]
    outs = []
    for p, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=300)
        outs.append(out)
        assert proc.returncode == 0, f"process {p} failed:\n{out[-3000:]}"
    assert "OK process 0" in outs[0]
    assert "OK process 1" in outs[1]


def test_loader_slices_partition_global_batch():
    """Pure-host check: per-process slices are disjoint and cover each
    global batch in order."""
    from itermvs_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return {"x": np.full((2,), float(i), np.float32)}

    views = []
    for p in range(3):
        ld = DataLoader(DS(), batch_size=6, shuffle=True, seed=11,
                        num_workers=1, drop_last=True,
                        process_index=p, process_count=3)
        ld.set_epoch(4)
        views.append([b["x"][:, 0].astype(int).tolist() for b in ld])

    whole = DataLoader(DS(), batch_size=6, shuffle=True, seed=11,
                       num_workers=1, drop_last=True)
    whole.set_epoch(4)
    global_batches = [b["x"][:, 0].astype(int).tolist() for b in whole]

    for bi, gb in enumerate(global_batches):
        recombined = views[0][bi] + views[1][bi] + views[2][bi]
        assert recombined == gb
