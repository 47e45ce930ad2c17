"""HiFi-GAN generator and MPD/MSD discriminators (behavioral parity:
/root/reference/parallel_wavegan/models/hifigan.py:23-864).

TPU notes:
  - The MRF (multi-receptive-field) sum runs the per-kernel residual blocks
    sequentially in Python; XLA fuses the elementwise tails into the convs.
  - The period discriminator's (B, C, T) -> (B, C, T/p, p) reshape is done
    channels-last as (B, T, C) -> (B, T/p, p, C), which keeps C on the minor
    axis the MXU wants.
  - follow_official_norm puts spectral norm on the first scale discriminator
    (reference hifigan.py:750-757).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from parallelwavegan_tpu.layers import (
    CausalConv1d,
    CausalConvTranspose1d,
    Conv1d,
    Conv2d,
    ConvTranspose1d,
    HiFiGANResidualBlock,
    get_activation,
    normal_init,
)
from parallelwavegan_tpu.models.melgan import avg_pool1d
from parallelwavegan_tpu.ops.conv import pad1d


def _params(d: Optional[Dict[str, Any]], default: Dict[str, Any]):
    out = dict(default)
    if d:
        out.update(d)
    return out


class HiFiGANGenerator(nn.Module):
    """Conv7 -> per scale [act, deconv(k=2s), MRF sum / N] -> act+Conv7+tanh."""

    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    use_additional_convs: bool = True
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[Dict[str, Any]] = None
    use_causal_conv: bool = False
    use_weight_norm: bool = True

    @property
    def upsample_factor(self) -> int:
        return int(np.prod(self.upsample_scales))

    @nn.compact
    def __call__(self, c, deterministic: bool = True):
        """c (B, T', in_channels) mel -> (B, T'*prod(scales), out_channels)."""
        assert self.kernel_size % 2 == 1
        assert len(self.upsample_scales) == len(self.upsample_kernel_sizes)
        assert len(self.resblock_dilations) == len(self.resblock_kernel_sizes)
        act_params = _params(
            self.nonlinear_activation_params, {"negative_slope": 0.1}
        )
        act = get_activation(self.nonlinear_activation, act_params)
        kinit = normal_init(0.01)
        conv_kw = dict(
            use_weight_norm=self.use_weight_norm, kernel_init=kinit,
            bias=self.bias,
        )
        if self.use_causal_conv:
            c = CausalConv1d(
                self.channels, self.kernel_size,
                use_weight_norm=self.use_weight_norm, kernel_init=kinit,
                bias=self.bias, name="input_conv",
            )(c, deterministic)
        else:
            c = Conv1d(
                self.channels, self.kernel_size,
                padding=(self.kernel_size - 1) // 2, name="input_conv",
                **conv_kw,
            )(c, deterministic)
        num_blocks = len(self.resblock_kernel_sizes)
        for i, (s, k_up) in enumerate(
            zip(self.upsample_scales, self.upsample_kernel_sizes)
        ):
            assert k_up == 2 * s
            out_ch = self.channels // (2 ** (i + 1))
            c = act(c)
            if self.use_causal_conv:
                c = CausalConvTranspose1d(
                    out_ch, k_up, stride=s,
                    use_weight_norm=self.use_weight_norm, kernel_init=kinit,
                    bias=self.bias, name=f"upsamples_{i}",
                )(c, deterministic)
            else:
                c = ConvTranspose1d(
                    out_ch, k_up, stride=s, padding=s // 2 + s % 2,
                    output_padding=s % 2, name=f"upsamples_{i}", **conv_kw,
                )(c, deterministic)
            cs = 0.0
            for j, (k_res, dils) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilations)
            ):
                cs += HiFiGANResidualBlock(
                    kernel_size=k_res,
                    channels=out_ch,
                    dilations=tuple(dils),
                    bias=self.bias,
                    use_additional_convs=self.use_additional_convs,
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=act_params,
                    use_causal_conv=self.use_causal_conv,
                    use_weight_norm=self.use_weight_norm,
                    kernel_init=kinit,
                    name=f"blocks_{i * num_blocks + j}",
                )(c, deterministic)
            c = cs / num_blocks
        # official impl uses default LeakyReLU slope (0.01) here
        c = nn.leaky_relu(c, negative_slope=0.01)
        if self.use_causal_conv:
            c = CausalConv1d(
                self.out_channels, self.kernel_size,
                use_weight_norm=self.use_weight_norm, kernel_init=kinit,
                bias=self.bias, name="output_conv",
            )(c, deterministic)
        else:
            c = Conv1d(
                self.out_channels, self.kernel_size,
                padding=(self.kernel_size - 1) // 2, name="output_conv",
                **conv_kw,
            )(c, deterministic)
        return jnp.tanh(c)


class HiFiGANPeriodDiscriminator(nn.Module):
    """Reshape wave to (T/p, p) image; 2D conv tower over the T/p axis."""

    in_channels: int = 1
    out_channels: int = 1
    period: int = 3
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 32
    downsample_scales: Sequence[int] = (3, 3, 3, 3, 1)
    max_downsample_channels: int = 1024
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[Dict[str, Any]] = None
    use_weight_norm: bool = True
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        assert len(self.kernel_sizes) == 2
        assert self.kernel_sizes[0] % 2 == 1 and self.kernel_sizes[1] % 2 == 1
        if self.use_weight_norm and self.use_spectral_norm:
            raise ValueError("Either use use_weight_norm or use_spectral_norm.")
        act = get_activation(
            self.nonlinear_activation,
            _params(self.nonlinear_activation_params, {"negative_slope": 0.1}),
        )
        B, T, C = x.shape
        if T % self.period != 0:
            n_pad = self.period - (T % self.period)
            x = pad1d(x, (0, n_pad), "reflect")
            T += n_pad
        x = x.reshape(B, T // self.period, self.period, C)

        conv_kw = dict(
            use_weight_norm=self.use_weight_norm,
            use_spectral_norm=self.use_spectral_norm,
            bias=self.bias,
        )
        outs = []
        out_chs = self.channels
        for i, s in enumerate(self.downsample_scales):
            x = Conv2d(
                out_chs, (self.kernel_sizes[0], 1), stride=(s, 1),
                padding=((self.kernel_sizes[0] - 1) // 2, 0),
                name=f"convs_{i}", **conv_kw,
            )(x, deterministic)
            x = act(x)
            outs.append(x)
            out_chs = min(out_chs * 4, self.max_downsample_channels)
        x = Conv2d(
            self.out_channels, (self.kernel_sizes[1] - 1, 1), stride=(1, 1),
            padding=((self.kernel_sizes[1] - 1) // 2, 0), name="output_conv",
            **conv_kw,
        )(x, deterministic)
        outs.append(x.reshape(B, -1))
        return outs


class HiFiGANMultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    discriminator_params: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[List[jnp.ndarray]]:
        outs = []
        for i, period in enumerate(self.periods):
            params = dict(self.discriminator_params or {})
            params["period"] = period
            outs.append(
                HiFiGANPeriodDiscriminator(
                    name=f"discriminators_{i}", **params
                )(x, deterministic)
            )
        return outs


class HiFiGANScaleDiscriminator(nn.Module):
    """Conv15 -> grouped strided conv tower -> two output convs."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (15, 41, 5, 3)
    channels: int = 128
    max_downsample_channels: int = 1024
    max_groups: int = 16
    bias: bool = True
    downsample_scales: Sequence[int] = (2, 2, 4, 4, 1)
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[Dict[str, Any]] = None
    use_weight_norm: bool = True
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        assert len(self.kernel_sizes) == 4
        for ks in self.kernel_sizes:
            assert ks % 2 == 1
        if self.use_weight_norm and self.use_spectral_norm:
            raise ValueError("Either use use_weight_norm or use_spectral_norm.")
        act = get_activation(
            self.nonlinear_activation,
            _params(self.nonlinear_activation_params, {"negative_slope": 0.1}),
        )
        conv_kw = dict(
            use_weight_norm=self.use_weight_norm,
            use_spectral_norm=self.use_spectral_norm,
            bias=self.bias,
        )
        outs = []
        x = Conv1d(
            self.channels, self.kernel_sizes[0],
            padding=(self.kernel_sizes[0] - 1) // 2, name="layer_0", **conv_kw,
        )(x, deterministic)
        x = act(x)
        outs.append(x)

        in_chs = self.channels
        out_chs = self.channels
        groups = 4
        li = 1
        for s in self.downsample_scales:
            x = Conv1d(
                out_chs, self.kernel_sizes[1], stride=s,
                padding=(self.kernel_sizes[1] - 1) // 2, groups=groups,
                name=f"layer_{li}", **conv_kw,
            )(x, deterministic)
            x = act(x)
            outs.append(x)
            in_chs = out_chs
            out_chs = min(in_chs * 2, self.max_downsample_channels)
            groups = min(groups * 4, self.max_groups)
            li += 1

        out_chs = min(in_chs * 2, self.max_downsample_channels)
        x = Conv1d(
            out_chs, self.kernel_sizes[2],
            padding=(self.kernel_sizes[2] - 1) // 2, name=f"layer_{li}",
            **conv_kw,
        )(x, deterministic)
        x = act(x)
        outs.append(x)
        li += 1
        x = Conv1d(
            self.out_channels, self.kernel_sizes[3],
            padding=(self.kernel_sizes[3] - 1) // 2, name=f"layer_{li}",
            **conv_kw,
        )(x, deterministic)
        outs.append(x)
        return outs


class HiFiGANMultiScaleDiscriminator(nn.Module):
    scales: int = 3
    downsample_pooling: str = "AvgPool1d"
    downsample_pooling_params: Optional[Dict[str, Any]] = None
    discriminator_params: Optional[Dict[str, Any]] = None
    follow_official_norm: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[List[jnp.ndarray]]:
        pool_params = _params(
            self.downsample_pooling_params,
            {"kernel_size": 4, "stride": 2, "padding": 2},
        )
        outs = []
        for i in range(self.scales):
            params = dict(self.discriminator_params or {})
            if self.follow_official_norm:
                params["use_weight_norm"] = i != 0
                params["use_spectral_norm"] = i == 0
            outs.append(
                HiFiGANScaleDiscriminator(
                    name=f"discriminators_{i}", **params
                )(x, deterministic)
            )
            x = avg_pool1d(x, count_include_pad=True, **pool_params)
        return outs


class HiFiGANMultiScaleMultiPeriodDiscriminator(nn.Module):
    scales: int = 3
    scale_downsample_pooling: str = "AvgPool1d"
    scale_downsample_pooling_params: Optional[Dict[str, Any]] = None
    scale_discriminator_params: Optional[Dict[str, Any]] = None
    follow_official_norm: bool = True
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    period_discriminator_params: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[List[jnp.ndarray]]:
        msd_outs = HiFiGANMultiScaleDiscriminator(
            scales=self.scales,
            downsample_pooling=self.scale_downsample_pooling,
            downsample_pooling_params=self.scale_downsample_pooling_params,
            discriminator_params=self.scale_discriminator_params,
            follow_official_norm=self.follow_official_norm,
            name="msd",
        )(x, deterministic)
        mpd_outs = HiFiGANMultiPeriodDiscriminator(
            periods=self.periods,
            discriminator_params=self.period_discriminator_params,
            name="mpd",
        )(x, deterministic)
        return msd_outs + mpd_outs
