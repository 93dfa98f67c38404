"""Orbax checkpointing: {epoch, step, params, batch_stats, opt_state}.

Mirrors the reference's per-epoch `model_{epoch:06d}.ckpt` cadence and
latest-epoch resume (train.py:103-112,152-157), and adds what the
reference lacks: step-granularity checkpoints (`--save_step_freq`)
named `model_{epoch:06d}_step{step:08d}.ckpt` carrying the number of
completed batches in that epoch. Because the loader's shuffle order is
a pure function of (seed, epoch) (data/loader.py:set_epoch), a resumed
run skips exactly those batches and continues on the same sequence.
"""
from __future__ import annotations

import os
import re

import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"model_(\d+)(?:_step(\d+))?\.ckpt$")

# Sort key for an epoch-end checkpoint: ranks above any step checkpoint
# of the same epoch (an epoch-end save supersedes its partial saves).
_EPOCH_END = 1 << 62


def save_checkpoint(logdir: str, epoch: int, state, step: int | None = None) -> str:
    """Save state. `step` = completed batches within `epoch`; None means
    the epoch finished (reference per-epoch cadence)."""
    name = (f"model_{epoch:0>6}.ckpt" if step is None
            else f"model_{epoch:0>6}_step{step:0>8}.ckpt")
    path = os.path.abspath(os.path.join(logdir, name))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "epoch": epoch,
        "step": _EPOCH_END if step is None else int(step),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(logdir: str) -> str | None:
    """Most-recent checkpoint by (epoch, progress-within-epoch)."""
    if not os.path.isdir(logdir):
        return None
    found = []
    for name in os.listdir(logdir):
        m = _CKPT_RE.search(name)
        if m:
            step = _EPOCH_END if m.group(2) is None else int(m.group(2))
            found.append((int(m.group(1)), step, name))
    if not found:
        return None
    return os.path.abspath(os.path.join(logdir, max(found)[2]))


def restore_checkpoint(path: str, state):
    """Restore into the given TrainState template.

    Returns (state, epoch, step) where step is the number of completed
    batches within `epoch`, or None if the epoch finished (resume at
    epoch + 1)."""
    ckptr = ocp.StandardCheckpointer()
    template = {
        "epoch": 0,
        "step": 0,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    try:
        restored = ckptr.restore(os.path.abspath(path), template)
    except (ValueError, KeyError, TypeError):
        # Template/tree mismatch: a pre-step-format checkpoint (no
        # "step" entry). Genuine failures (missing/corrupt checkpoint)
        # raise FileNotFoundError/OSError etc. and propagate.
        del template["step"]
        restored = ckptr.restore(os.path.abspath(path), template)
        restored["step"] = _EPOCH_END
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    step = int(restored["step"])
    return state, int(restored["epoch"]), (None if step >= _EPOCH_END else step)


def _restore_any(path: str):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def restore_weights_only(path: str, state):
    """Load params + batch_stats from either an Orbax dir or a torch ckpt."""
    if os.path.isdir(path):
        restored = _restore_any(path)
        return state.replace(params=restored["params"],
                             batch_stats=restored["batch_stats"])
    # torch pickle → convert
    from itermvs_tpu.engine.torch_import import import_torch_checkpoint

    variables = import_torch_checkpoint(path)
    return state.replace(params=variables["params"],
                         batch_stats=variables["batch_stats"])


def load_variables(path: str):
    """Load inference variables {'params', 'batch_stats'} from any format:
    an Orbax directory, a vendored .npz (save_npz_variables), or a torch
    pickle (one-way converted)."""
    if os.path.isdir(path):
        restored = _restore_any(path)
        return {"params": restored["params"], "batch_stats": restored["batch_stats"]}
    if path.endswith(".npz"):
        return load_npz_variables(path)
    from itermvs_tpu.engine.torch_import import import_torch_checkpoint

    return import_torch_checkpoint(path)


def pretrained_path(name: str = "dtu") -> str | None:
    """Path to released IterMVS weights: the vendored .npz conversion
    committed under <repo>/checkpoints/<name>/ (self-contained), else
    the reference mount's torch pickle, else None."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    vendored = os.path.join(repo, "checkpoints", name, "model_000015.npz")
    if os.path.exists(vendored):
        return vendored
    torch_ckpt = f"/root/reference/checkpoints/{name}/model_000015.ckpt"
    return torch_ckpt if os.path.exists(torch_ckpt) else None


def save_npz_variables(path: str, variables) -> None:
    """Write inference variables as a flat .npz ('/'-joined tree paths).

    The vendored-weights format: plain NumPy, no torch or Orbax needed
    to read it, small enough to commit (the model is ~0.34 M params,
    reference checkpoints/dtu/model_000015.ckpt)."""
    import numpy as np

    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", variables)
    with open(path, "wb") as f:
        np.savez_compressed(f, **flat)


def load_npz_variables(path: str):
    """Inverse of save_npz_variables → nested {'params', 'batch_stats'}."""
    import numpy as np

    tree: dict = {}
    with np.load(path) as data:
        for key in data.files:
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
    return tree
