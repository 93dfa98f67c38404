"""One-way importer: reference torch checkpoint → flax variables.

The released checkpoints (reference: checkpoints/{dtu,blendedmvs}/
model_000015.ckpt) are torch pickles `{epoch, model, optimizer}` whose
model keys carry the DataParallel `module.` prefix (150 tensors).

Transforms applied:
  * Conv2d weight OIHW → HWIO (transpose 2,3,1,0);
  * ConvTranspose2d weight IOHW → ready-to-correlate HWIO with spatial
    flip (our ConvTranspose runs the transposed conv as an
    input-dilated correlation, see models/blocks.py);
  * BatchNorm weight/bias → scale/bias params, running_mean/var →
    batch_stats mean/var;
  * the dead `inner3` lateral (never used by the reference forward,
    net.py:25) is dropped.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _conv(w):
    return jnp.asarray(np.ascontiguousarray(w.transpose(2, 3, 1, 0)))


def _deconv(w):
    # torch ConvTranspose2d stores [in, out, kh, kw]; flip kh/kw for the
    # correlation formulation and lay out HWIO (I=in, O=out).
    return jnp.asarray(np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1]))


def _vec(w):
    return jnp.asarray(np.ascontiguousarray(w))


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a reference ckpt (or bare state dict) to numpy, deprefixed."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    state = raw["model"] if isinstance(raw, dict) and "model" in raw else raw
    out = {}
    for key, value in state.items():
        if key.startswith("module."):
            key = key[len("module."):]
        out[key] = value.detach().cpu().numpy()
    return out


def import_torch_checkpoint(path: str):
    """Returns flax `{'params': ..., 'batch_stats': ...}` for Pipeline."""
    sd = load_torch_state_dict(path)
    params: dict = {}
    stats: dict = {}

    def put(tree, dotted, value):
        node = tree
        parts = dotted.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def conv_bn(dst, src):
        put(params, f"{dst}/conv/conv/kernel", _conv(sd[f"{src}.conv.weight"]))
        put(params, f"{dst}/bn/bn/scale", _vec(sd[f"{src}.bn.weight"]))
        put(params, f"{dst}/bn/bn/bias", _vec(sd[f"{src}.bn.bias"]))
        put(stats, f"{dst}/bn/bn/mean", _vec(sd[f"{src}.bn.running_mean"]))
        put(stats, f"{dst}/bn/bn/var", _vec(sd[f"{src}.bn.running_var"]))

    def plain_conv(dst, src, bias=True):
        put(params, f"{dst}/conv/kernel", _conv(sd[f"{src}.weight"]))
        if bias:
            put(params, f"{dst}/conv/bias", _vec(sd[f"{src}.bias"]))

    # FeatureNet -----------------------------------------------------
    fn = "feature_net"
    conv_bn(f"{fn}/conv1", f"{fn}.conv1")
    for layer in (1, 2, 3):
        for block in (0, 1):
            dst = f"{fn}/layer{layer}_{block}"
            src = f"{fn}.layer{layer}.{block}"
            conv_bn(f"{dst}/conv1", f"{src}.conv1")
            conv_bn(f"{dst}/conv2", f"{src}.conv2")
            if block == 0:
                conv_bn(f"{dst}/downsample", f"{src}.downsample")
    for k in (1, 2, 3):
        plain_conv(f"{fn}/output{k}", f"{fn}.output{k}")
    for k in (1, 2):
        plain_conv(f"{fn}/inner{k}", f"{fn}.inner{k}")

    # IterMVS: upsample head ------------------------------------------
    mv = "iter_mvs"
    plain_conv(f"{mv}/upsample_conv0", f"{mv}.upsample.0", bias=False)
    plain_conv(f"{mv}/upsample_conv1", f"{mv}.upsample.2", bias=False)

    # Evaluation ------------------------------------------------------
    ev = f"{mv}/evaluation"
    evs = f"{mv}.evaluation"
    put(params, f"{ev}/pixel_view_weight/conv0/conv/conv/kernel",
        _conv(sd[f"{evs}.pixel_view_weight.conv.0.conv.weight"]))
    plain_conv(f"{ev}/pixel_view_weight/conv1", f"{evs}.pixel_view_weight.conv.1")
    for i in range(3):
        dst = f"{ev}/corr_net{i + 1}"
        src = f"{evs}.corr_conv1.{i}"
        for c in ("conv0", "conv1", "conv2"):
            put(params, f"{dst}/{c}/conv/conv/kernel", _conv(sd[f"{src}.{c}.conv.weight"]))
        put(params, f"{dst}/conv3/kernel", _deconv(sd[f"{src}.conv3.weight"]))
        put(params, f"{dst}/conv4/kernel", _deconv(sd[f"{src}.conv4.weight"]))
        plain_conv(f"{dst}/conv5", f"{src}.conv5")

    # Update ----------------------------------------------------------
    up = f"{mv}/update"
    ups = f"{mv}.update"
    for gate in ("convz", "convr", "convq"):
        plain_conv(f"{up}/gru/{gate}", f"{ups}.gru.{gate}")
    plain_conv(f"{up}/depth_conv0", f"{ups}.depth_head.0", bias=False)
    plain_conv(f"{up}/depth_conv1", f"{ups}.depth_head.2", bias=False)
    plain_conv(f"{up}/depth_conv2", f"{ups}.depth_head.4")
    plain_conv(f"{up}/conf_conv0", f"{ups}.confidence_head.0", bias=False)
    plain_conv(f"{up}/conf_conv1", f"{ups}.confidence_head.2")
    plain_conv(f"{up}/hidden_conv0", f"{ups}.hidden_init_head.0", bias=False)
    plain_conv(f"{up}/hidden_conv1", f"{ups}.hidden_init_head.2")

    return {"params": params, "batch_stats": stats}
