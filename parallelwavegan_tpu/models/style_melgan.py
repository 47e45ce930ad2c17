"""StyleMelGAN generator / discriminator (behavioral parity:
/root/reference/parallel_wavegan/models/style_melgan.py:18-361).

RNG discipline: the reference draws noise and random windows from global
torch/np RNG; here both come from explicit flax RNG streams ("noise" for the
generator's latent, "window" for the discriminator's random windows), keeping
the step function pure and jittable (window slices use lax.dynamic_slice with
static sizes).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from parallelwavegan_tpu.layers import (
    Conv1d,
    ConvTranspose1d,
    TADEResBlock,
    get_activation,
    normal_init,
)
from parallelwavegan_tpu.models.melgan import MelGANDiscriminator
from parallelwavegan_tpu.ops.pqmf import pqmf_analysis


class StyleMelGANGenerator(nn.Module):
    """Noise (B, 1, in_channels) -> deconv noise-upsample -> 9 TADEResBlocks
    conditioned on mel -> Conv9 + tanh."""

    in_channels: int = 128
    aux_channels: int = 80
    channels: int = 64
    out_channels: int = 1
    kernel_size: int = 9
    dilation: int = 2
    bias: bool = True
    noise_upsample_scales: Sequence[int] = (11, 2, 2, 2)
    noise_upsample_activation: str = "LeakyReLU"
    noise_upsample_activation_params: Optional[Dict[str, Any]] = None
    upsample_scales: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2, 1)
    upsample_mode: str = "nearest"
    gated_function: str = "softmax"
    use_weight_norm: bool = True

    @property
    def noise_upsample_factor(self) -> int:
        return int(np.prod(self.noise_upsample_scales))

    @property
    def upsample_factor(self) -> int:
        return int(np.prod(self.upsample_scales))

    def _noise_upsample(self, z, deterministic):
        act = get_activation(
            self.noise_upsample_activation,
            dict(self.noise_upsample_activation_params or
                 {"negative_slope": 0.2}),
        )
        kinit = normal_init(0.02)
        x = z
        for i, s in enumerate(self.noise_upsample_scales):
            x = ConvTranspose1d(
                self.channels, s * 2, stride=s, padding=s // 2 + s % 2,
                output_padding=s % 2, bias=self.bias,
                use_weight_norm=self.use_weight_norm, kernel_init=kinit,
                name=f"noise_upsample_{i}",
            )(x, deterministic)
            x = act(x)
        return x

    @nn.compact
    def __call__(self, c, z=None, deterministic: bool = True):
        """c (B, T', aux) mel; z (B, 1, in_channels) noise (drawn from the
        "noise" RNG stream when None). Returns (B, T'*upsample_factor, out)."""
        kinit = normal_init(0.02)
        if z is None:
            # one noise frame covers noise_upsample_factor mel frames
            # (reference style_melgan.py:216-221 draws ceil(T'/factor)
            # noise frames; training crops are exactly one factor long,
            # longer mels need more)
            nf = (c.shape[1] - 1) // self.noise_upsample_factor + 1
            z = jax.random.normal(
                self.make_rng("noise"), (c.shape[0], nf, self.in_channels),
                dtype=c.dtype,
            )
        x = self._noise_upsample(z, deterministic)
        if c.shape[1] < x.shape[1]:
            # replicate-pad the conditioning to the noise-upsampled grid
            # (reference style_melgan.py:231 — callers crop the output
            # back to T'*upsample_factor)
            c = jnp.pad(
                c, ((0, 0), (0, x.shape[1] - c.shape[1]), (0, 0)),
                mode="edge",
            )
        for i, s in enumerate(self.upsample_scales):
            x, c = TADEResBlock(
                in_channels=self.channels,
                aux_channels=self.aux_channels if i == 0 else self.channels,
                kernel_size=self.kernel_size,
                dilation=self.dilation,
                bias=self.bias,
                upsample_factor=s,
                gated_function=self.gated_function,
                use_weight_norm=self.use_weight_norm,
                name=f"blocks_{i}",
            )(x, c, deterministic)
        x = Conv1d(
            self.out_channels, self.kernel_size,
            padding=(self.kernel_size - 1) // 2, bias=self.bias,
            use_weight_norm=self.use_weight_norm, kernel_init=kinit,
            name="output_conv",
        )(x, deterministic)
        return jnp.tanh(x)

    def inference(self, variables, c, rng=None, normalize_before=False,
                  mean=None, scale=None):
        """Mel (T', C) -> wave (T'*upsample_factor, out_channels).

        Pads the mel to the noise-upsample grid and crops the output to kill
        end-of-audio pop noise (reference style_melgan.py:227-238).
        """
        if rng is None:
            rng = jax.random.key(0)
        if normalize_before:
            c = (c - mean) / scale
        c = c[None]
        noise_frames = (c.shape[1] - 1) // self.noise_upsample_factor + 1
        noise_t = noise_frames * self.noise_upsample_factor
        total_length = c.shape[1] * self.upsample_factor
        c = jnp.pad(c, ((0, 0), (0, noise_t - c.shape[1]), (0, 0)), mode="edge")
        z = jax.random.normal(
            rng, (1, noise_frames, self.in_channels), dtype=c.dtype
        )
        y = self.apply(variables, c, z, rngs={"noise": rng})
        return y[0, :total_length]


class StyleMelGANDiscriminator(nn.Module):
    """Random-window discriminator: per repeat, slice 4 random windows,
    PQMF-analyze windows 2-4 into subbands, feed MelGAN discriminators."""

    repeats: int = 2
    window_sizes: Sequence[int] = (512, 1024, 2048, 4096)
    pqmf_params: Sequence[Sequence[Any]] = (
        (1, None, None, None),
        (2, 62, 0.26700, 9.0),
        (4, 62, 0.14200, 9.0),
        (8, 62, 0.07949, 9.0),
    )
    discriminator_params: Optional[Dict[str, Any]] = None
    use_weight_norm: bool = True

    @nn.compact
    def __call__(
        self,
        x,
        deterministic: bool = True,
        window_starts: Optional[Sequence[int]] = None,
    ) -> List[List[jnp.ndarray]]:
        """x (B, T, 1) -> list of repeats * len(window_sizes) fmap lists.

        window_starts: optional flat list of repeats*len(window_sizes) fixed
        window start indices (testing/debug override of the "window" RNG
        stream; reference draws from global np RNG at style_melgan.py:330).
        """
        assert len(self.window_sizes) == len(self.pqmf_params)
        sizes = [ws // p[0] for ws, p in zip(self.window_sizes, self.pqmf_params)]
        assert all(s == sizes[0] for s in sizes)
        d_defaults = {
            "out_channels": 1,
            "kernel_sizes": (5, 3),
            "channels": 16,
            "max_downsample_channels": 512,
            "bias": True,
            "downsample_scales": (4, 4, 4, 1),
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.2},
            "pad": "ReflectionPad1d",
        }
        d_params = dict(d_defaults)
        if self.discriminator_params:
            d_params.update(self.discriminator_params)
        d_params.pop("pad_params", None)

        discriminators = [
            MelGANDiscriminator(
                in_channels=pq[0],
                use_weight_norm=self.use_weight_norm,
                name=f"discriminators_{idx}",
                **d_params,
            )
            for idx, pq in enumerate(self.pqmf_params)
        ]
        outs = []
        for r in range(self.repeats):
            for idx, (ws, pq) in enumerate(
                zip(self.window_sizes, self.pqmf_params)
            ):
                if window_starts is not None:
                    start = window_starts[r * len(self.window_sizes) + idx]
                else:
                    start = jax.random.randint(
                        self.make_rng("window"), (), 0, x.shape[1] - ws
                    )
                x_ = jax.lax.dynamic_slice_in_dim(x, start, ws, axis=1)
                subbands = pq[0]
                if subbands > 1:
                    x_ = pqmf_analysis(x_, subbands, pq[1], pq[2], pq[3])
                outs.append(discriminators[idx](x_, deterministic))
        return outs
