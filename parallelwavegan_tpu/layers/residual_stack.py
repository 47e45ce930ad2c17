"""MelGAN residual stack (behavioral parity:
/root/reference/parallel_wavegan/layers/residual_stack.py:13-85)."""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from parallelwavegan_tpu.layers.causal_conv import CausalConv1d
from parallelwavegan_tpu.layers.common import (
    Conv1d,
    Initializer,
    get_activation,
    pad_mode_from_torch,
    torch_conv_default_init,
)


class ResidualStack(nn.Module):
    """act -> pad -> dilated conv -> act -> 1x1 conv, plus 1x1 skip conv."""

    kernel_size: int = 3
    channels: int = 32
    dilation: int = 1
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[dict] = None
    pad: str = "ReflectionPad1d"
    use_causal_conv: bool = False
    use_weight_norm: bool = True
    kernel_init: Initializer = torch_conv_default_init

    @nn.compact
    def __call__(self, c, deterministic: bool = True):
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.2},
        )
        conv_kw = dict(
            use_weight_norm=self.use_weight_norm, kernel_init=self.kernel_init
        )
        x = act(c)
        if self.use_causal_conv:
            x = CausalConv1d(
                self.channels, self.kernel_size, dilation=self.dilation,
                bias=self.bias, pad=self.pad, name="conv_dilated", **conv_kw,
            )(x, deterministic)
        else:
            assert (self.kernel_size - 1) % 2 == 0
            x = Conv1d(
                self.channels, self.kernel_size, dilation=self.dilation,
                bias=self.bias,
                padding=(self.kernel_size - 1) // 2 * self.dilation,
                pad_mode=pad_mode_from_torch(self.pad),
                name="conv_dilated", **conv_kw,
            )(x, deterministic)
        x = act(x)
        x = Conv1d(self.channels, 1, bias=self.bias, name="conv1x1", **conv_kw)(
            x, deterministic
        )
        skip = Conv1d(
            self.channels, 1, bias=self.bias, name="skip_layer", **conv_kw
        )(c, deterministic)
        return x + skip
