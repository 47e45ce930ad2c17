"""MelGAN generator / discriminators (behavioral parity:
/root/reference/parallel_wavegan/models/melgan.py:17-534).

Init note: the reference calls reset_parameters() (N(0,0.02)) *after*
apply_weight_norm(), which torch's pre-forward hook overwrites on the first
forward — so its effective init is torch's conv default. Here the official
MelGAN N(0,0.02) init is applied *as* the base init (the intent of the
reference code); imported checkpoints are unaffected.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from parallelwavegan_tpu.layers import (
    CausalConv1d,
    CausalConvTranspose1d,
    Conv1d,
    ConvTranspose1d,
    ResidualStack,
    get_activation,
    normal_init,
    pad_mode_from_torch,
)
from parallelwavegan_tpu.ops.conv import pad1d


def avg_pool1d(x, kernel_size=4, stride=2, padding=1, count_include_pad=False):
    """torch.nn.AvgPool1d on (B, T, C)."""
    ones = jnp.ones((1, x.shape[1], 1), x.dtype)
    sum_fn = lambda v: jax.lax.reduce_window(
        v, 0.0, jax.lax.add, (1, kernel_size, 1), (1, stride, 1),
        [(0, 0), (padding, padding), (0, 0)],
    )
    s = sum_fn(x)
    if count_include_pad:
        return s / kernel_size
    cnt = sum_fn(jnp.broadcast_to(ones, (1, x.shape[1], 1)))
    return s / cnt


def _params(d: Optional[Dict[str, Any]], default: Dict[str, Any]):
    out = dict(default)
    if d:
        out.update(d)
    return out


class MelGANGenerator(nn.Module):
    """Conv7 -> per scale [act, deconv(k=2s), stacks x ResidualStack] ->
    act + Conv7 (+ tanh). out_channels=4 -> multi-band (PQMF synthesis is
    applied by the caller at inference time)."""

    in_channels: int = 80
    out_channels: int = 1
    kernel_size: int = 7
    channels: int = 512
    bias: bool = True
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    stack_kernel_size: int = 3
    stacks: int = 3
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[Dict[str, Any]] = None
    pad: str = "ReflectionPad1d"
    pad_params: Optional[Dict[str, Any]] = None
    use_final_nonlinear_activation: bool = True
    use_weight_norm: bool = True
    use_causal_conv: bool = False

    @property
    def upsample_factor(self) -> int:
        return int(np.prod(self.upsample_scales)) * 1

    @nn.compact
    def __call__(self, c, deterministic: bool = True):
        """c (B, T', in_channels) -> (B, T'*prod(scales), out_channels)."""
        assert self.channels >= np.prod(self.upsample_scales)
        assert self.channels % (2 ** len(self.upsample_scales)) == 0
        act = get_activation(
            self.nonlinear_activation,
            _params(self.nonlinear_activation_params, {"negative_slope": 0.2}),
        )
        kinit = normal_init(0.02)
        conv_kw = dict(
            use_weight_norm=self.use_weight_norm, kernel_init=kinit,
            bias=self.bias,
        )
        x = c
        li = 0
        if not self.use_causal_conv:
            assert (self.kernel_size - 1) % 2 == 0
            x = pad1d(
                x,
                ((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2),
                pad_mode_from_torch(self.pad),
            )
            x = Conv1d(
                self.channels, self.kernel_size, name=f"layer_{li}", **conv_kw
            )(x, deterministic)
        else:
            x = CausalConv1d(
                self.channels, self.kernel_size, pad=self.pad,
                use_weight_norm=self.use_weight_norm, kernel_init=kinit,
                bias=self.bias, name=f"layer_{li}",
            )(x, deterministic)
        li += 1

        for i, s in enumerate(self.upsample_scales):
            x = act(x)
            out_ch = self.channels // (2 ** (i + 1))
            if not self.use_causal_conv:
                x = ConvTranspose1d(
                    out_ch, s * 2, stride=s, padding=s // 2 + s % 2,
                    output_padding=s % 2, name=f"layer_{li}", **conv_kw,
                )(x, deterministic)
            else:
                x = CausalConvTranspose1d(
                    out_ch, s * 2, stride=s,
                    use_weight_norm=self.use_weight_norm, kernel_init=kinit,
                    bias=self.bias, name=f"layer_{li}",
                )(x, deterministic)
            li += 1
            for j in range(self.stacks):
                x = ResidualStack(
                    kernel_size=self.stack_kernel_size,
                    channels=out_ch,
                    dilation=self.stack_kernel_size**j,
                    bias=self.bias,
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=_params(
                        self.nonlinear_activation_params,
                        {"negative_slope": 0.2},
                    ),
                    pad=self.pad,
                    use_causal_conv=self.use_causal_conv,
                    use_weight_norm=self.use_weight_norm,
                    kernel_init=kinit,
                    name=f"layer_{li}",
                )(x, deterministic)
                li += 1

        x = act(x)
        if not self.use_causal_conv:
            x = pad1d(
                x,
                ((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2),
                pad_mode_from_torch(self.pad),
            )
            x = Conv1d(
                self.out_channels, self.kernel_size, name=f"layer_{li}",
                **conv_kw,
            )(x, deterministic)
        else:
            x = CausalConv1d(
                self.out_channels, self.kernel_size, pad=self.pad,
                use_weight_norm=self.use_weight_norm, kernel_init=kinit,
                bias=self.bias, name=f"layer_{li}",
            )(x, deterministic)
        if self.use_final_nonlinear_activation:
            x = jnp.tanh(x)
        return x


class MelGANDiscriminator(nn.Module):
    """Downsampling conv tower; returns the list of all layer feature maps
    (last entry = logits)."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 16
    max_downsample_channels: int = 1024
    bias: bool = True
    downsample_scales: Sequence[int] = (4, 4, 4, 4)
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[Dict[str, Any]] = None
    pad: str = "ReflectionPad1d"
    pad_params: Optional[Dict[str, Any]] = None
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        assert len(self.kernel_sizes) == 2
        assert self.kernel_sizes[0] % 2 == 1 and self.kernel_sizes[1] % 2 == 1
        act = get_activation(
            self.nonlinear_activation,
            _params(self.nonlinear_activation_params, {"negative_slope": 0.2}),
        )
        kinit = normal_init(0.02)
        conv_kw = dict(
            use_weight_norm=self.use_weight_norm, kernel_init=kinit,
            bias=self.bias,
        )
        outs = []
        k0 = int(np.prod(self.kernel_sizes))
        x = pad1d(x, ((k0 - 1) // 2, (k0 - 1) // 2), pad_mode_from_torch(self.pad))
        x = Conv1d(self.channels, k0, name="layer_0", **conv_kw)(x, deterministic)
        x = act(x)
        outs.append(x)

        in_chs = self.channels
        li = 1
        for s in self.downsample_scales:
            out_chs = min(in_chs * s, self.max_downsample_channels)
            x = Conv1d(
                out_chs, s * 10 + 1, stride=s, padding=s * 5,
                groups=in_chs // 4, name=f"layer_{li}", **conv_kw,
            )(x, deterministic)
            x = act(x)
            outs.append(x)
            in_chs = out_chs
            li += 1

        out_chs = min(in_chs * 2, self.max_downsample_channels)
        x = Conv1d(
            out_chs, self.kernel_sizes[0],
            padding=(self.kernel_sizes[0] - 1) // 2, name=f"layer_{li}",
            **conv_kw,
        )(x, deterministic)
        x = act(x)
        outs.append(x)
        li += 1
        x = Conv1d(
            self.out_channels, self.kernel_sizes[1],
            padding=(self.kernel_sizes[1] - 1) // 2, name=f"layer_{li}",
            **conv_kw,
        )(x, deterministic)
        outs.append(x)
        return outs


class MelGANMultiScaleDiscriminator(nn.Module):
    """N discriminator copies with AvgPool1d between scales; returns list of
    per-scale feature-map lists."""

    in_channels: int = 1
    out_channels: int = 1
    scales: int = 3
    downsample_pooling: str = "AvgPool1d"
    downsample_pooling_params: Optional[Dict[str, Any]] = None
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 16
    max_downsample_channels: int = 1024
    bias: bool = True
    downsample_scales: Sequence[int] = (4, 4, 4, 4)
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[Dict[str, Any]] = None
    pad: str = "ReflectionPad1d"
    pad_params: Optional[Dict[str, Any]] = None
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[List[jnp.ndarray]]:
        assert self.downsample_pooling == "AvgPool1d"
        pool_params = _params(
            self.downsample_pooling_params,
            {"kernel_size": 4, "stride": 2, "padding": 1,
             "count_include_pad": False},
        )
        outs = []
        for i in range(self.scales):
            outs.append(
                MelGANDiscriminator(
                    in_channels=self.in_channels,
                    out_channels=self.out_channels,
                    kernel_sizes=self.kernel_sizes,
                    channels=self.channels,
                    max_downsample_channels=self.max_downsample_channels,
                    bias=self.bias,
                    downsample_scales=self.downsample_scales,
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=self.nonlinear_activation_params,
                    pad=self.pad,
                    use_weight_norm=self.use_weight_norm,
                    name=f"discriminators_{i}",
                )(x, deterministic)
            )
            x = avg_pool1d(x, **pool_params)
        return outs
