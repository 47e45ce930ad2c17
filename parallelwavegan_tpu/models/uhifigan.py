"""U-Net HiFiGAN for singing voice (behavioral parity:
/root/reference/parallel_wavegan/models/uhifigan.py:19-387).

Excitation waveform (from the sine generator) runs down a strided-conv
encoder with MRF blocks and skip connections; the mel is injected at the
bottleneck; the decoder upsamples with skip concatenation. The f0 argument is
accepted but unused in forward, matching the reference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from parallelwavegan_tpu.layers import (
    Conv1d,
    ConvTranspose1d,
    HiFiGANResidualBlock,
    get_activation,
    normal_init,
)


class UHiFiGANGenerator(nn.Module):
    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    downsample_scales: Sequence[int] = (8, 8, 2, 2)
    downsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    dropout: float = 0.3
    use_additional_convs: bool = True
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[Dict[str, Any]] = None
    use_causal_conv: bool = False
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, c, f0=None, excitation=None, deterministic: bool = True):
        """c (B, T', in_channels) mel; excitation (B, T, out_channels) wave.

        Returns (B, T, out_channels).
        """
        assert self.kernel_size % 2 == 1
        assert not self.use_causal_conv, "causal UHiFiGAN is not supported"
        act_params = dict(
            self.nonlinear_activation_params or {"negative_slope": 0.1}
        )
        act = get_activation(self.nonlinear_activation, act_params)
        kinit = normal_init(0.01)
        conv_kw = dict(
            use_weight_norm=self.use_weight_norm, kernel_init=kinit,
            bias=self.bias,
        )
        num_blocks = len(self.resblock_kernel_sizes)

        def mrf(x, prefix, idx, channels):
            cs = 0.0
            for j, (k_res, dils) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilations)
            ):
                cs += HiFiGANResidualBlock(
                    kernel_size=k_res, channels=channels, dilations=tuple(dils),
                    bias=self.bias,
                    use_additional_convs=self.use_additional_convs,
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=act_params,
                    use_weight_norm=self.use_weight_norm, kernel_init=kinit,
                    name=f"{prefix}_mrf_{idx * num_blocks + j}",
                )(x, deterministic)
            return cs / num_blocks

        hidden = Conv1d(
            self.channels, self.kernel_size,
            padding=(self.kernel_size - 1) // 2, name="input_conv", **conv_kw,
        )(excitation, deterministic)
        hidden = act(hidden)
        hidden = nn.Dropout(self.dropout)(hidden, deterministic=deterministic)

        ch = self.channels
        skips = []
        for i, (s, k) in enumerate(
            zip(self.downsample_scales, self.downsample_kernel_sizes)
        ):
            hidden = mrf(hidden, "downsamples", i, ch)
            hidden = Conv1d(
                ch * 2, k, stride=s, padding=s // 2 + s % 2,
                name=f"downsamples_{i}", **conv_kw,
            )(hidden, deterministic)
            hidden = act(hidden)
            hidden = nn.Dropout(self.dropout)(
                hidden, deterministic=deterministic
            )
            skips.append(hidden)
            ch *= 2
        skips.reverse()

        hidden_mel = Conv1d(
            ch, self.kernel_size, padding=(self.kernel_size - 1) // 2,
            name="hidden_conv", **conv_kw,
        )(c, deterministic)

        for i, (s, k) in enumerate(
            zip(self.upsample_scales, self.upsample_kernel_sizes)
        ):
            hidden_mel = jnp.concatenate([hidden_mel, skips[i]], axis=-1)
            hidden_mel = act(hidden_mel)
            hidden_mel = ConvTranspose1d(
                ch // 2, k, stride=s, padding=s // 2 + s % 2,
                output_padding=s % 2, name=f"upsamples_{i}", **conv_kw,
            )(hidden_mel, deterministic)
            hidden_mel = mrf(hidden_mel, "upsamples", i, ch // 2)
            ch //= 2

        x = nn.leaky_relu(hidden_mel, negative_slope=0.01)
        x = Conv1d(
            self.out_channels, self.kernel_size,
            padding=(self.kernel_size - 1) // 2, name="output_conv", **conv_kw,
        )(x, deterministic)
        return jnp.tanh(x)
