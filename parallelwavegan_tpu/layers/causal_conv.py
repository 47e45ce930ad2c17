"""Causal conv layers (behavioral parity:
/root/reference/parallel_wavegan/layers/causal_conv.py:12-78)."""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from parallelwavegan_tpu.layers.common import (
    Conv1d,
    ConvTranspose1d,
    Initializer,
    pad_mode_from_torch,
    torch_conv_default_init,
)
from parallelwavegan_tpu.ops.conv import pad1d


class CausalConv1d(nn.Module):
    """Left-padded conv; output[t] depends only on input[<=t]."""

    features: int
    kernel_size: int
    dilation: int = 1
    bias: bool = True
    pad: str = "ConstantPad1d"  # torch pad-module name (config parity)
    use_weight_norm: bool = False
    kernel_init: Initializer = torch_conv_default_init

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        T = x.shape[1]
        p = (self.kernel_size - 1) * self.dilation
        # reference pads both sides then crops to T; identical result, and
        # keeps reflect/replicate pad semantics exact
        x = pad1d(x, (p, p), pad_mode_from_torch(self.pad))
        y = Conv1d(
            features=self.features,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            bias=self.bias,
            use_weight_norm=self.use_weight_norm,
            kernel_init=self.kernel_init,
            name="conv",
        )(x, deterministic)
        return y[:, :T, :]


class CausalConvTranspose1d(nn.Module):
    """Replication-padded deconv cropped to T_in * stride (causal upsample)."""

    features: int
    kernel_size: int
    stride: int
    bias: bool = True
    pad: str = "ReplicationPad1d"
    use_weight_norm: bool = False
    kernel_init: Initializer = torch_conv_default_init

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = pad1d(x, (1, 0), pad_mode_from_torch(self.pad))
        y = ConvTranspose1d(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            bias=self.bias,
            use_weight_norm=self.use_weight_norm,
            kernel_init=self.kernel_init,
            name="deconv",
        )(x, deterministic)
        return y[:, self.stride : -self.stride, :]
