"""Dataset registry (reference: datasets/__init__.py:5-8).

`find_dataset_def(name)` resolves the same loader names the reference
CLIs accept: dtu_yao, dtu_yao_eval, blendedmvs, tanks, eth3d, custom.
"""
from __future__ import annotations

import importlib

_ALIASES = {
    "dtu_yao": "itermvs_tpu.data.dtu",
    "dtu_yao_eval": "itermvs_tpu.data.dtu_eval",
    "blendedmvs": "itermvs_tpu.data.blendedmvs",
    "tanks": "itermvs_tpu.data.tanks",
    "eth3d": "itermvs_tpu.data.eth3d",
    "custom": "itermvs_tpu.data.custom",
}


def find_dataset_def(dataset_name: str):
    module = importlib.import_module(_ALIASES[dataset_name])
    return getattr(module, "MVSDataset")
