"""Orbax checkpointing: {epoch, params, batch_stats, opt_state}.

Mirrors the reference's per-epoch `model_{epoch:06d}.ckpt` cadence and
latest-epoch resume (train.py:103-112,152-157); checkpoints are Orbax
directories named `model_{epoch:06d}.ckpt`.
"""
from __future__ import annotations

import os
import re

import jax
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"model_(\d+)\.ckpt$")


def save_checkpoint(logdir: str, epoch: int, state) -> str:
    path = os.path.abspath(os.path.join(logdir, f"model_{epoch:0>6}.ckpt"))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "epoch": epoch,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(logdir: str) -> str | None:
    if not os.path.isdir(logdir):
        return None
    found = []
    for name in os.listdir(logdir):
        m = _CKPT_RE.search(name)
        if m:
            found.append((int(m.group(1)), name))
    if not found:
        return None
    return os.path.abspath(os.path.join(logdir, max(found)[1]))


def restore_checkpoint(path: str, state):
    """Restore into the given TrainState template; returns (state, epoch)."""
    ckptr = ocp.StandardCheckpointer()
    template = {
        "epoch": 0,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = ckptr.restore(os.path.abspath(path), template)
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return state, int(restored["epoch"])


def restore_weights_only(path: str, state):
    """Load params + batch_stats from either an Orbax dir or a torch ckpt."""
    if os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        template = {
            "epoch": 0,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = ckptr.restore(os.path.abspath(path), template)
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
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        return {"params": restored["params"], "batch_stats": restored["batch_stats"]}
    from itermvs_tpu.engine.torch_import import import_torch_checkpoint

    return import_torch_checkpoint(path)
