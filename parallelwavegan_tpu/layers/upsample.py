"""Mel upsampling networks for Parallel WaveGAN (behavioral parity:
/root/reference/parallel_wavegan/layers/upsample.py:16-194).

The reference treats the mel as a 1-channel 2D image (B, 1, C, T) and
interleaves nearest-neighbor stretch with smoothing Conv2d. Here the mel stays
channels-last (B, T, C); the stretch is a time-axis repeat and the smoothing
conv is a 2D conv over (freq, time) with a single in/out channel, expressed in
NHWC so XLA keeps the layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from parallelwavegan_tpu.layers.common import (
    Conv1d,
    Conv2d,
    get_activation,
    kaiming_normal_relu_init,
    mean_filter_init,
    zeros_init,
)
from parallelwavegan_tpu.ops.conv import upsample_nearest_time


class UpsampleNetwork(nn.Module):
    """Per scale s: nearest time-stretch x s, then (freq_k, 2s+1) mean-init
    bias-free Conv2d smoothing."""

    upsample_scales: Sequence[int]
    nonlinear_activation: Optional[str] = None
    nonlinear_activation_params: Optional[dict] = None
    interpolate_mode: str = "nearest"
    freq_axis_kernel_size: int = 1
    use_causal_conv: bool = False
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, c, deterministic: bool = True):
        assert self.interpolate_mode == "nearest"
        act = (
            get_activation(
                self.nonlinear_activation, self.nonlinear_activation_params
            )
            if self.nonlinear_activation is not None
            else None
        )
        # (B, T, C) -> NHWC image (B, C_freq, T, 1)
        x = jnp.transpose(c, (0, 2, 1))[..., None]
        for i, scale in enumerate(self.upsample_scales):
            # stretch along time (W axis)
            B, F, T, _ = x.shape
            x = jnp.broadcast_to(
                x[:, :, :, None, :], (B, F, T, scale, 1)
            ).reshape(B, F, T * scale, 1)
            assert (self.freq_axis_kernel_size - 1) % 2 == 0
            fp = (self.freq_axis_kernel_size - 1) // 2
            tp = scale * 2 if self.use_causal_conv else scale
            T_now = x.shape[2]
            x = Conv2d(
                1,
                kernel_size=(self.freq_axis_kernel_size, scale * 2 + 1),
                padding=(fp, tp),
                bias=False,
                use_weight_norm=self.use_weight_norm,
                kernel_init=mean_filter_init,
                name=f"conv_{i}",
            )(x, deterministic)
            if self.use_causal_conv:
                x = x[:, :, :T_now, :]
            if act is not None:
                x = act(x)
        return jnp.transpose(x[..., 0], (0, 2, 1))  # (B, T', C)


class ConvInUpsampleNetwork(nn.Module):
    """Context Conv1d over +-aux_context_window frames, then UpsampleNetwork.

    Input is pre-padded by the caller with aux_context_window frames, so the
    context conv uses no padding (reference upsample.py:166-169).
    """

    upsample_scales: Sequence[int]
    nonlinear_activation: Optional[str] = None
    nonlinear_activation_params: Optional[dict] = None
    interpolate_mode: str = "nearest"
    freq_axis_kernel_size: int = 1
    aux_channels: int = 80
    aux_context_window: int = 0
    use_causal_conv: bool = False
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, c, deterministic: bool = True):
        causal = self.use_causal_conv and self.aux_context_window > 0
        kernel_size = (
            self.aux_context_window + 1
            if self.use_causal_conv
            else 2 * self.aux_context_window + 1
        )
        c_ = Conv1d(
            self.aux_channels, kernel_size, bias=False,
            use_weight_norm=self.use_weight_norm,
            kernel_init=kaiming_normal_relu_init, bias_init=zeros_init,
            name="conv_in",
        )(c, deterministic)
        c = c_[:, : -self.aux_context_window, :] if causal else c_
        return UpsampleNetwork(
            upsample_scales=self.upsample_scales,
            nonlinear_activation=self.nonlinear_activation,
            nonlinear_activation_params=self.nonlinear_activation_params,
            interpolate_mode=self.interpolate_mode,
            freq_axis_kernel_size=self.freq_axis_kernel_size,
            use_causal_conv=self.use_causal_conv,
            use_weight_norm=self.use_weight_norm,
            name="upsample",
        )(c, deterministic)
