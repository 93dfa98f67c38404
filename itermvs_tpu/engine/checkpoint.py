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
    """Load inference variables {'params', 'batch_stats'} from any format."""
    if os.path.isdir(path):
        restored = _restore_any(path)
        return {"params": restored["params"], "batch_stats": restored["batch_stats"]}
    from itermvs_tpu.engine.torch_import import import_torch_checkpoint

    return import_torch_checkpoint(path)
