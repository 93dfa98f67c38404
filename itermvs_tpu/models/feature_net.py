"""Multi-scale FPN feature extractor (reference: models/net.py:7-66).

Encoder: conv 3→8, then three 2-block residual stages 8→16→32→48 with
stride-2 entries. FPN decoder with 1×1 laterals and ×2 bilinear adds.
Outputs `level3` 48ch @ H/8, `level2` 32ch @ H/4, `level1` 16ch @ H/2.

Views are folded into the batch axis by the caller ([B·V, H, W, 3]) —
the layout the MXU wants and the same fold the reference training path
uses (net.py:38-43), which also defines the BatchNorm statistics.

The reference also defines an `inner3` lateral that is never used
(net.py:25); we do not reproduce dead weight.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from itermvs_tpu.models.blocks import Conv, ConvBnReLU, ResidualBlock
from itermvs_tpu.ops.resize import upsample_bilinear
from itermvs_tpu.ops.space_to_depth import (
    space_to_depth, stride1_kernel_s2d, stride2_kernel_s2d, tile_phases)


class FeatureNet(nn.Module):
    dtype: Any = jnp.float32
    # Run the full-resolution stem (conv1 + layer1_0) over a
    # space-to-depth half-res grid — identical math, 4× fewer output
    # positions for the model's only full-res convs (whose 3/8-channel
    # tiles waste the 128-lane MXU). Inference only: BN batch statistics
    # are phase-pooled on the s2d grid, so training keeps the standard
    # stem (and init always does, to create the canonical param tree).
    s2d_stem: bool = False

    def _subtree(self, collection: str, path: tuple[str, ...]):
        node = self.variables[collection]
        for p in path:
            node = node[p]
        return node

    def _bn_eval(self, path: tuple[str, ...], x, tile: bool = False):
        """flax BatchNorm eval-mode math from this module's variables."""
        p = self._subtree("params", path)["bn"]["bn"]
        s = self._subtree("batch_stats", path)["bn"]["bn"]
        scale, bias, mean, var = p["scale"], p["bias"], s["mean"], s["var"]
        if tile:
            scale, bias = tile_phases(scale), tile_phases(bias)
            mean, var = tile_phases(mean), tile_phases(var)
        dt = x.dtype
        mul = (scale * jax.lax.rsqrt(var + 1e-5)).astype(dt)
        return (x - mean.astype(dt)) * mul + bias.astype(dt)

    def _kernel(self, path: tuple[str, ...]):
        return self._subtree("params", path)["conv"]["conv"]["kernel"]

    def _fast_stem(self, x):
        """conv1 + layer1_0 on the space-to-depth grid (eval only)."""
        dt = self.dtype
        conv = lambda v, k, pad: jax.lax.conv_general_dilated(
            v, k.astype(dt), window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        xs = space_to_depth(x)                               # [N,H/2,W/2,12]
        k1 = stride1_kernel_s2d(self._kernel(("conv1",)))    # [3,3,12,32]
        f0 = nn.relu(self._bn_eval(
            ("conv1",), conv(xs, k1, ((1, 1), (1, 1))), tile=True))
        ka = stride2_kernel_s2d(self._kernel(("layer1_0", "conv1")))
        y = nn.relu(self._bn_eval(
            ("layer1_0", "conv1"), conv(f0, ka, ((1, 0), (1, 0)))))
        kb = self._kernel(("layer1_0", "conv2"))             # [3,3,16,16]
        y = self._bn_eval(
            ("layer1_0", "conv2"), conv(y, kb, ((1, 1), (1, 1))))
        kd = stride2_kernel_s2d(self._kernel(("layer1_0", "downsample")))
        xd = self._bn_eval(
            ("layer1_0", "downsample"), conv(f0, kd, ((1, 0), (1, 0))))
        return nn.relu(xd + y)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [N, H, W, 3] → dict of level1/2/3 features, NHWC."""
        dt = self.dtype
        x = x.astype(dt)
        if self.s2d_stem and not train and not self.is_initializing():
            fea1 = self._fast_stem(x)
        else:
            fea0 = ConvBnReLU(8, dtype=dt, name="conv1")(x, train)
            fea1 = ResidualBlock(16, stride=2, dtype=dt,
                                 name="layer1_0")(fea0, train)
        fea1 = ResidualBlock(16, dtype=dt, name="layer1_1")(fea1, train)
        fea2 = ResidualBlock(32, stride=2, dtype=dt, name="layer2_0")(fea1, train)
        fea2 = ResidualBlock(32, dtype=dt, name="layer2_1")(fea2, train)
        fea3 = ResidualBlock(48, stride=2, dtype=dt, name="layer3_0")(fea2, train)
        fea3 = ResidualBlock(48, dtype=dt, name="layer3_1")(fea3, train)

        level3 = Conv(48, 3, dtype=dt, name="output3")(fea3)
        intra = (upsample_bilinear(fea3, 2)
                 + Conv(48, 1, pad=0, dtype=dt, name="inner2")(fea2))
        level2 = Conv(32, 3, dtype=dt, name="output2")(intra)
        intra = (upsample_bilinear(intra, 2)
                 + Conv(48, 1, pad=0, dtype=dt, name="inner1")(fea1))
        level1 = Conv(16, 3, dtype=dt, name="output1")(intra)
        return {"level1": level1, "level2": level2, "level3": level3}
