"""StyleMelGAN TADE layers (behavioral parity:
/root/reference/parallel_wavegan/layers/tade_res_block.py:11-160)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from parallelwavegan_tpu.layers.common import Conv1d, instance_norm_1d
from parallelwavegan_tpu.ops.conv import upsample_nearest_time


class TADELayer(nn.Module):
    """y = gamma(c) * upsample(norm(x)) + beta(c); returns (y, conv(c))."""

    in_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 9
    bias: bool = True
    upsample_factor: int = 2
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x, c, deterministic: bool = True):
        x = instance_norm_1d(x)
        c = upsample_nearest_time(c, self.upsample_factor)
        pad = (self.kernel_size - 1) // 2
        conv_kw = dict(use_weight_norm=self.use_weight_norm, bias=self.bias)
        c = Conv1d(
            self.in_channels, self.kernel_size, padding=pad, name="aux_conv",
            **conv_kw,
        )(c, deterministic)
        cg = Conv1d(
            self.in_channels * 2, self.kernel_size, padding=pad,
            name="gated_conv", **conv_kw,
        )(c, deterministic)
        cg1 = cg[..., : self.in_channels]
        cg2 = cg[..., self.in_channels :]
        y = cg1 * upsample_nearest_time(x, self.upsample_factor) + cg2
        return y, c


class TADEResBlock(nn.Module):
    """TADE -> gated conv -> TADE(upsample) -> gated dilated conv
    + upsampled residual."""

    in_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 9
    dilation: int = 2
    bias: bool = True
    upsample_factor: int = 2
    gated_function: str = "softmax"
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x, c, deterministic: bool = True):
        if self.gated_function == "softmax":
            gate = lambda v: jax.nn.softmax(v, axis=-1)
        elif self.gated_function == "sigmoid":
            gate = jax.nn.sigmoid
        else:
            raise ValueError(f"{self.gated_function} is not supported.")
        residual = x
        pad = (self.kernel_size - 1) // 2
        conv_kw = dict(use_weight_norm=self.use_weight_norm, bias=self.bias)

        x, c = TADELayer(
            self.in_channels, self.aux_channels, self.kernel_size, self.bias,
            upsample_factor=1, use_weight_norm=self.use_weight_norm,
            name="tade1",
        )(x, c, deterministic)
        x = Conv1d(
            self.in_channels * 2, self.kernel_size, padding=pad,
            name="gated_conv1", **conv_kw,
        )(x, deterministic)
        xa, xb = x[..., : self.in_channels], x[..., self.in_channels :]
        x = gate(xa) * jnp.tanh(xb)

        x, c = TADELayer(
            self.in_channels, self.in_channels, self.kernel_size, self.bias,
            upsample_factor=self.upsample_factor,
            use_weight_norm=self.use_weight_norm, name="tade2",
        )(x, c, deterministic)
        x = Conv1d(
            self.in_channels * 2, self.kernel_size, dilation=self.dilation,
            padding=pad * self.dilation, name="gated_conv2", **conv_kw,
        )(x, deterministic)
        xa, xb = x[..., : self.in_channels], x[..., self.in_channels :]
        x = gate(xa) * jnp.tanh(xb)

        return upsample_nearest_time(residual, self.upsample_factor) + x, c
