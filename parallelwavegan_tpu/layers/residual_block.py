"""WaveNet / HiFiGAN residual blocks (behavioral parity:
/root/reference/parallel_wavegan/layers/residual_block.py:43-258)."""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from parallelwavegan_tpu.layers.causal_conv import CausalConv1d
from parallelwavegan_tpu.layers.common import (
    Conv1d,
    get_activation,
    kaiming_normal_relu_init,
    zeros_init,
)


class WaveNetResidualBlock(nn.Module):
    """Dilated gated residual block: conv -> split -> +aux -> tanh*sigmoid
    -> 1x1 skip & 1x1 residual, residual scaled by sqrt(0.5)."""

    kernel_size: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    dropout: float = 0.0
    dilation: int = 1
    bias: bool = True
    use_causal_conv: bool = False
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x, c=None, deterministic: bool = True):
        residual = x
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        conv_kw = dict(
            use_weight_norm=self.use_weight_norm,
            kernel_init=kaiming_normal_relu_init,
            bias_init=zeros_init,
        )
        if self.use_causal_conv:
            pad = (self.kernel_size - 1) * self.dilation
            x = Conv1d(
                self.gate_channels, self.kernel_size, dilation=self.dilation,
                bias=self.bias, padding=(pad, 0), name="conv", **conv_kw,
            )(x, deterministic)
        else:
            assert (self.kernel_size - 1) % 2 == 0
            pad = (self.kernel_size - 1) // 2 * self.dilation
            x = Conv1d(
                self.gate_channels, self.kernel_size, dilation=self.dilation,
                bias=self.bias, padding=pad, name="conv", **conv_kw,
            )(x, deterministic)

        gate_out = self.gate_channels // 2
        xa, xb = x[..., :gate_out], x[..., gate_out:]
        if c is not None:
            assert self.aux_channels > 0
            c = Conv1d(
                self.gate_channels, 1, bias=False, name="conv1x1_aux", **conv_kw
            )(c, deterministic)
            xa = xa + c[..., :gate_out]
            xb = xb + c[..., gate_out:]
        x = jnp.tanh(xa) * nn.sigmoid(xb)

        s = Conv1d(
            self.skip_channels, 1, bias=self.bias, name="conv1x1_skip", **conv_kw
        )(x, deterministic)
        x = Conv1d(
            self.residual_channels, 1, bias=self.bias, name="conv1x1_out", **conv_kw
        )(x, deterministic)
        x = (x + residual) * math.sqrt(0.5)
        return x, s


class HiFiGANResidualBlock(nn.Module):
    """Per dilation d: act+conv(k,d) [+ act+conv(k,1)] + identity."""

    kernel_size: int = 3
    channels: int = 512
    dilations: Tuple[int, ...] = (1, 3, 5)
    bias: bool = True
    use_additional_convs: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[dict] = None
    use_causal_conv: bool = False
    use_weight_norm: bool = True
    kernel_init: Optional[object] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        assert self.kernel_size % 2 == 1
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.1},
        )
        kinit = self.kernel_init
        for i, dilation in enumerate(self.dilations):
            xt = act(x)
            conv_kw = dict(use_weight_norm=self.use_weight_norm)
            if kinit is not None:
                conv_kw["kernel_init"] = kinit
            if self.use_causal_conv:
                xt = CausalConv1d(
                    self.channels, self.kernel_size, dilation=dilation,
                    bias=self.bias, name=f"convs1_{i}",
                    use_weight_norm=self.use_weight_norm,
                    **({"kernel_init": kinit} if kinit is not None else {}),
                )(xt, deterministic)
            else:
                xt = Conv1d(
                    self.channels, self.kernel_size, dilation=dilation,
                    bias=self.bias,
                    padding=(self.kernel_size - 1) // 2 * dilation,
                    name=f"convs1_{i}", **conv_kw,
                )(xt, deterministic)
            if self.use_additional_convs:
                xt = act(xt)
                if self.use_causal_conv:
                    xt = CausalConv1d(
                        self.channels, self.kernel_size, dilation=1,
                        bias=self.bias, name=f"convs2_{i}",
                        use_weight_norm=self.use_weight_norm,
                        **({"kernel_init": kinit} if kinit is not None else {}),
                    )(xt, deterministic)
                else:
                    xt = Conv1d(
                        self.channels, self.kernel_size, dilation=1,
                        bias=self.bias, padding=(self.kernel_size - 1) // 2,
                        name=f"convs2_{i}", **conv_kw,
                    )(xt, deterministic)
            x = xt + x
        return x
