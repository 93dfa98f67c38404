"""NN building blocks, NHWC Flax modules.

Functional equivalents of the reference's block zoo
(models/module.py:6-66): conv+BN+ReLU variants, residual blocks with
strided-BN downsampling skip, and the dilated ConvGRU. All convolutions
run in NHWC/HWIO — the TPU-native layout — and BN matches torch
BatchNorm2d defaults (eps 1e-5, momentum 0.1 ⇒ flax momentum 0.9).

Every block takes a `dtype` (computation dtype): float32 for exact
reference parity, bfloat16 for the fast MXU path. Parameters are always
stored float32 (`param_dtype`); bf16 mode casts activations + params at
the conv inputs only.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class Conv(nn.Module):
    """2D conv with torch-compatible explicit padding. Kernel HWIO."""
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class ConvTranspose(nn.Module):
    """Transposed conv with exact torch ConvTranspose2d semantics.

    Implemented as an input-dilated correlation: dilate the input by
    `stride`, pad by (k−1−p, k−1−p+output_padding), correlate with the
    spatially-flipped kernel. The stored kernel is already in the
    ready-to-correlate HWIO layout (the torch-ckpt importer performs the
    IOHW→HWIO transpose + spatial flip once at load time).
    """
    features: int
    kernel: int = 3
    stride: int = 2
    pad: int = 1
    output_padding: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.kernel, self.kernel, in_features, self.features),
        )
        lo = self.kernel - 1 - self.pad
        hi = lo + self.output_padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class BatchNorm(nn.Module):
    """torch-default BatchNorm2d: eps 1e-5, running-stat momentum 0.1."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)


class ConvBnReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, self.kernel, self.stride, self.pad,
                 self.dilation, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, train)
        return nn.relu(x)


class ConvBn(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, self.kernel, self.stride, self.pad,
                 self.dilation, use_bias=False, dtype=self.dtype, name="conv")(x)
        return BatchNorm(dtype=self.dtype, name="bn")(x, train)


class ConvReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, self.kernel, self.stride, self.pad,
                 self.dilation, use_bias=False, dtype=self.dtype, name="conv")(x)
        return nn.relu(x)


class ResidualBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnReLU(self.features, stride=self.stride, dtype=self.dtype,
                       name="conv1")(x, train)
        y = ConvBn(self.features, dtype=self.dtype, name="conv2")(y, train)
        if self.stride != 1:
            x = ConvBn(self.features, stride=self.stride, dtype=self.dtype,
                       name="downsample")(x, train)
        return nn.relu(x + y)


class ConvGRU(nn.Module):
    """Convolutional GRU with 3×3 dilation-2 gates (module.py:52-66)."""
    hidden_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x.astype(h.dtype)], axis=-1)
        z = nn.sigmoid(Conv(self.hidden_dim, 3, pad=2, dilation=2,
                            dtype=self.dtype, name="convz")(hx))
        r = nn.sigmoid(Conv(self.hidden_dim, 3, pad=2, dilation=2,
                            dtype=self.dtype, name="convr")(hx))
        rh_x = jnp.concatenate([r * h, x.astype(h.dtype)], axis=-1)
        q = nn.tanh(Conv(self.hidden_dim, 3, pad=2, dilation=2,
                         dtype=self.dtype, name="convq")(rh_x))
        return (1.0 - z) * h + z * q
