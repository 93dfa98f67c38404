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

import jax.numpy as jnp
import flax.linen as nn

from itermvs_tpu.models.blocks import Conv, ConvBnReLU, ResidualBlock
from itermvs_tpu.ops.resize import upsample_bilinear


class FeatureNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [N, H, W, 3] → dict of level1/2/3 features, NHWC."""
        dt = self.dtype
        x = x.astype(dt)
        fea0 = ConvBnReLU(8, dtype=dt, name="conv1")(x, train)
        fea1 = ResidualBlock(16, stride=2, dtype=dt, name="layer1_0")(fea0, train)
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
