"""Mel upsampling networks for Parallel WaveGAN (behavioral parity:
/root/reference/parallel_wavegan/layers/upsample.py:16-194).

The reference treats the mel as a 1-channel 2D image (B, 1, C, T) and
interleaves nearest-neighbor stretch with smoothing Conv2d. A literal NHWC
translation keeps a trailing size-1 channel dim that TPU pads to 128 lanes
(128x memory blowup — a (8, 80, 131072, 1) bf16 intermediate would be 21 GB).

Instead each stretch+conv stage is evaluated as a *polyphase filter* in
channels-last (B, T, C): output sample t = u*scale + p depends on at most 3
coarse frames (u-1, u, u+1 — or u-2..u causal), with per-phase weights
W[p, j] = sum of the conv taps that hit coarse frame j at phase p. The whole
stage is 3 fused multiply-adds over (B, T0, scale, C) with channels on
lanes — one memory pass, no image layout. Parameters are identical to the
reference's Conv2d (kernel (freq_k, 2*scale+1, 1, 1), mean-init, weight
norm), so checkpoints import unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from parallelwavegan_tpu.layers.common import (
    Conv1d,
    _ConvBase,
    get_activation,
    kaiming_normal_relu_init,
    mean_filter_init,
    zeros_init,
)


def _polyphase_matrix(scale: int, kt: int, tp: int, n_taps: int,
                      j_start: int) -> np.ndarray:
    """0/1 matrix M (scale*n_taps, kt) with W = M @ k_time.

    Output t = u*scale + p equals sum_dt k[dt] * stretched[t + dt - tp] where
    stretched[m] = coarse[m // scale]; tap j covers coarse frame u + j_start
    + j, i.e. the dt with (t + dt - tp) // scale == u + j_start + j.
    """
    M = np.zeros((scale * n_taps, kt), dtype=np.float32)
    for p in range(scale):
        for j in range(n_taps):
            q = j_start + j  # coarse frame offset relative to u
            lo = q * scale + tp - p
            hi = lo + scale - 1
            for dt in range(max(lo, 0), min(hi, kt - 1) + 1):
                M[p * n_taps + j, dt] = 1.0
    return M


class _PolyphaseSmoothingConv(_ConvBase):
    """The reference's 1-channel smoothing Conv2d, evaluated polyphase.

    Parameter layout matches Conv2d: kernel (freq_k, 2*scale+1, 1, 1) with
    mean-filter init and optional weight norm (so torch checkpoints map 1:1).
    """

    scale: int
    freq_axis_kernel_size: int = 1
    use_causal_conv: bool = False
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, c, deterministic: bool = True):
        fk = self.freq_axis_kernel_size
        s = self.scale
        kt = 2 * s + 1
        kernel = self._kernel(
            (fk, kt, 1, 1), mean_filter_init, self.use_weight_norm, False,
            deterministic,
        )[..., 0, 0]  # (fk, kt)
        tp = 2 * s if self.use_causal_conv else s
        j_start = -2 if self.use_causal_conv else -1
        n_taps = 3
        M = jnp.asarray(
            _polyphase_matrix(s, kt, tp, n_taps, j_start), dtype=c.dtype
        )
        W = (kernel @ M.T).reshape(fk, s, n_taps)  # (fk, scale, taps)

        B, T0, C = c.shape
        fp = (fk - 1) // 2
        pl_, pr = (-j_start, n_taps - 1 + j_start)  # coarse zero pad
        cpad = jnp.pad(c, ((0, 0), (pl_, pr), (fp, fp)))
        out = jnp.zeros((B, T0, s, C), c.dtype)
        for df in range(fk):
            for j in range(n_taps):
                view = cpad[:, j : j + T0, df : df + C]
                out = out + view[:, :, None, :] * W[df, :, j][None, None, :, None]
        return out.reshape(B, T0 * s, C)


class UpsampleNetwork(nn.Module):
    """Per scale s: nearest time-stretch x s, then (freq_k, 2s+1) mean-init
    bias-free Conv2d smoothing — fused into one polyphase stage."""

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
        assert (self.freq_axis_kernel_size - 1) % 2 == 0
        act = (
            get_activation(
                self.nonlinear_activation, self.nonlinear_activation_params
            )
            if self.nonlinear_activation is not None
            else None
        )
        x = c
        for i, scale in enumerate(self.upsample_scales):
            x = _PolyphaseSmoothingConv(
                scale=scale,
                freq_axis_kernel_size=self.freq_axis_kernel_size,
                use_causal_conv=self.use_causal_conv,
                use_weight_norm=self.use_weight_norm,
                name=f"conv_{i}",
            )(x, deterministic)
            if act is not None:
                x = act(x)
        return x


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
