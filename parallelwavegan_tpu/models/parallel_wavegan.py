"""Parallel WaveGAN generator / discriminators (behavioral parity:
/root/reference/parallel_wavegan/models/parallel_wavegan.py:21-515).

Channels-last (B, T, C); the 30-layer dilated WaveNet stack is the PWG hot
loop — each block is one dilated conv + gated fuse + two 1x1s, all of which
XLA fuses around MXU contractions in this layout.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from parallelwavegan_tpu.layers import (
    Conv1d,
    ConvInUpsampleNetwork,
    UpsampleNetwork,
    WaveNetResidualBlock,
    get_activation,
    kaiming_normal_relu_init,
    zeros_init,
)


def _frozen(d: Optional[Dict[str, Any]], default: Dict[str, Any]):
    out = dict(default)
    if d:
        out.update(d)
    return out


class ParallelWaveGANGenerator(nn.Module):
    """Non-causal WaveNet on noise z conditioned on upsampled mel."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    dropout: float = 0.0
    bias: bool = True
    use_weight_norm: bool = True
    use_causal_conv: bool = False
    upsample_conditional_features: bool = True
    upsample_net: str = "ConvInUpsampleNetwork"
    upsample_params: Optional[Dict[str, Any]] = None

    @property
    def upsample_factor(self) -> int:
        if not self.upsample_conditional_features:
            return 1
        scales = _frozen(self.upsample_params, {"upsample_scales": [4, 4, 4, 4]})[
            "upsample_scales"
        ]
        out = 1
        for s in scales:
            out *= s
        return out

    @property
    def receptive_field_size(self) -> int:
        assert self.layers % self.stacks == 0
        lpc = self.layers // self.stacks
        dils = [2 ** (i % lpc) for i in range(self.layers)]
        return (self.kernel_size - 1) * sum(dils) + 1

    def make_upsample_module(self, parent=None):
        """Construct the conditioning upsample submodule (name=upsample_net).

        Used by `__call__` and by the fused Pallas inference path
        (ops/pallas/pwg_infer.py), which runs it standalone via
        `.apply({"params": params["upsample_net"]}, c)` (parent=None detaches
        it from this module's scope).
        """
        up_params = _frozen(
            self.upsample_params, {"upsample_scales": [4, 4, 4, 4]}
        )
        up_params["use_causal_conv"] = self.use_causal_conv
        # the reference mutates upsample_params in place with these keys
        # (models/parallel_wavegan.py:96-103); tolerate configs carrying them
        up_params.pop("aux_channels", None)
        up_params.pop("aux_context_window", None)
        if self.upsample_net == "ConvInUpsampleNetwork":
            return ConvInUpsampleNetwork(
                aux_channels=self.aux_channels,
                aux_context_window=self.aux_context_window,
                use_weight_norm=self.use_weight_norm,
                name="upsample_net",
                parent=parent,
                **up_params,
            )
        elif self.upsample_net == "UpsampleNetwork":
            return UpsampleNetwork(
                use_weight_norm=self.use_weight_norm,
                name="upsample_net",
                parent=parent,
                **up_params,
            )
        elif self.upsample_net == "MelGANGenerator":
            from parallelwavegan_tpu.models.melgan import MelGANGenerator

            assert self.aux_context_window == 0
            up_params["use_weight_norm"] = False
            up_params["use_final_nonlinear_activation"] = False
            return MelGANGenerator(
                name="upsample_net", parent=parent, **up_params
            )
        raise ValueError(f"unknown upsample_net: {self.upsample_net}")

    @nn.compact
    def __call__(self, z, c, deterministic: bool = True):
        """z (B, T, in_channels) noise; c (B, T'(+2*ctx), aux) mel.

        Returns (B, T, out_channels).
        """
        conv_kw = dict(
            use_weight_norm=self.use_weight_norm,
            kernel_init=kaiming_normal_relu_init,
            bias_init=zeros_init,
        )
        if c is not None and self.upsample_conditional_features:
            c = self.make_upsample_module(parent=self)(c, deterministic)
            assert c.shape[1] == z.shape[1], (c.shape, z.shape)

        x = Conv1d(
            self.residual_channels, 1, bias=True, name="first_conv", **conv_kw
        )(z, deterministic)
        assert self.layers % self.stacks == 0
        lpc = self.layers // self.stacks
        skips = 0.0
        for layer in range(self.layers):
            x, h = WaveNetResidualBlock(
                kernel_size=self.kernel_size,
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                aux_channels=self.aux_channels,
                dilation=2 ** (layer % lpc),
                dropout=self.dropout,
                bias=self.bias,
                use_causal_conv=self.use_causal_conv,
                use_weight_norm=self.use_weight_norm,
                name=f"conv_layers_{layer}",
            )(x, c, deterministic)
            skips += h
        skips *= math.sqrt(1.0 / self.layers)

        x = nn.relu(skips)
        x = Conv1d(
            self.skip_channels, 1, bias=True, name="last_conv_0", **conv_kw
        )(x, deterministic)
        x = nn.relu(x)
        x = Conv1d(
            self.out_channels, 1, bias=True, name="last_conv_1", **conv_kw
        )(x, deterministic)
        return x

    def inference(self, variables, c, rng=None, normalize_before=False,
                  mean=None, scale=None):
        """Copy-synthesis: mel (T', C) -> wave (T, out_channels)."""
        if rng is None:
            rng = jax.random.key(0)
        if normalize_before:
            c = (c - mean) / scale
        c = c[None]  # (1, T', C)
        c = jnp.pad(
            c,
            ((0, 0), (self.aux_context_window, self.aux_context_window), (0, 0)),
            mode="edge",
        )
        T = (c.shape[1] - 2 * self.aux_context_window) * self.upsample_factor
        z = jax.random.normal(rng, (1, T, self.in_channels))
        return self.apply(variables, z, c)[0]


class ParallelWaveGANDiscriminator(nn.Module):
    """10-layer dilated conv stack; returns (B, T, out_channels) logits."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 10
    conv_channels: int = 64
    dilation_factor: int = 1
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[Dict[str, Any]] = None
    bias: bool = True
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        assert (self.kernel_size - 1) % 2 == 0
        assert self.dilation_factor > 0
        act = get_activation(
            self.nonlinear_activation,
            _frozen(self.nonlinear_activation_params, {"negative_slope": 0.2}),
        )
        conv_kw = dict(
            use_weight_norm=self.use_weight_norm,
            kernel_init=kaiming_normal_relu_init,
            bias_init=zeros_init,
        )
        for i in range(self.layers - 1):
            dilation = 1 if i == 0 else (
                i if self.dilation_factor == 1 else self.dilation_factor**i
            )
            x = Conv1d(
                self.conv_channels, self.kernel_size,
                padding=(self.kernel_size - 1) // 2 * dilation,
                dilation=dilation, bias=self.bias, name=f"conv_{i}", **conv_kw,
            )(x, deterministic)
            x = act(x)
        x = Conv1d(
            self.out_channels, self.kernel_size,
            padding=(self.kernel_size - 1) // 2, bias=self.bias,
            name="last_conv", **conv_kw,
        )(x, deterministic)
        return x


class ResidualParallelWaveGANDiscriminator(nn.Module):
    """WaveNet-style discriminator (no conditioning)."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    dropout: float = 0.0
    bias: bool = True
    use_weight_norm: bool = True
    use_causal_conv: bool = False
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        assert (self.kernel_size - 1) % 2 == 0
        act = get_activation(
            self.nonlinear_activation,
            _frozen(self.nonlinear_activation_params, {"negative_slope": 0.2}),
        )
        conv_kw = dict(
            use_weight_norm=self.use_weight_norm,
            kernel_init=kaiming_normal_relu_init,
            bias_init=zeros_init,
        )
        x = Conv1d(
            self.residual_channels, 1, bias=True, name="first_conv", **conv_kw
        )(x, deterministic)
        x = act(x)
        assert self.layers % self.stacks == 0
        lpc = self.layers // self.stacks
        skips = 0.0
        for layer in range(self.layers):
            x, h = WaveNetResidualBlock(
                kernel_size=self.kernel_size,
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                aux_channels=0,
                dilation=2 ** (layer % lpc),
                dropout=self.dropout,
                bias=self.bias,
                use_causal_conv=self.use_causal_conv,
                use_weight_norm=self.use_weight_norm,
                name=f"conv_layers_{layer}",
            )(x, None, deterministic)
            skips += h
        skips *= math.sqrt(1.0 / self.layers)

        x = act(skips)
        x = Conv1d(
            self.skip_channels, 1, bias=True, name="last_conv_0", **conv_kw
        )(x, deterministic)
        x = act(x)
        x = Conv1d(
            self.out_channels, 1, bias=True, name="last_conv_1", **conv_kw
        )(x, deterministic)
        return x
