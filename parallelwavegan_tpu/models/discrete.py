"""Discrete-symbol (HuBERT-token) vocoder generators (behavioral parity:
/root/reference/parallel_wavegan/models/hifigan.py:867-1487 and
style_melgan.py:364-602).

Variants:
  - DiscreteSymbolHiFiGANGenerator: token (+speaker) embeddings -> HiFiGAN
  - DiscreteSymbolDurationGenerator: + duration predictor / length regulator
  - DiscreteSymbolF0Generator: + f0 linear embedding, optional learned
    softmax-weighted sum over L HuBERT layers
  - DiscreteSymbolStyleMelGANGenerator: token embeddings -> StyleMelGAN
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from parallelwavegan_tpu.layers import (
    Conv1d,
    ConvTranspose1d,
    Dense,
    DurationPredictor,
    HiFiGANResidualBlock,
    get_activation,
    length_regulator,
    normal_init,
)
from parallelwavegan_tpu.models.style_melgan import StyleMelGANGenerator


class _HiFiGANTrunk(nn.Module):
    """Shared HiFiGAN trunk used by the discrete-symbol variants (the
    reference re-declares it inline; upsample padding is (k-s)//2 with no
    output_padding here, unlike the base HiFiGANGenerator)."""

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
    use_weight_norm: bool = True
    # the F0 variant re-declares input_conv as a plain torch Conv1d AFTER
    # weight norm is applied, so it is never weight-normed there
    # (reference hifigan.py:1393-1400)
    input_conv_weight_norm: bool = True

    @nn.compact
    def __call__(self, c, deterministic: bool = True):
        act_params = dict(
            self.nonlinear_activation_params or {"negative_slope": 0.1}
        )
        act = get_activation(self.nonlinear_activation, act_params)
        kinit = normal_init(0.01)
        conv_kw = dict(use_weight_norm=self.use_weight_norm, kernel_init=kinit)
        c = Conv1d(
            self.channels, self.kernel_size,
            padding=(self.kernel_size - 1) // 2, name="input_conv",
            use_weight_norm=(
                self.use_weight_norm and self.input_conv_weight_norm
            ),
            kernel_init=kinit,
        )(c, deterministic)
        num_blocks = len(self.resblock_kernel_sizes)
        for i, (s, k_up) in enumerate(
            zip(self.upsample_scales, self.upsample_kernel_sizes)
        ):
            out_ch = self.channels // (2 ** (i + 1))
            c = act(c)
            c = ConvTranspose1d(
                out_ch, k_up, stride=s, padding=(k_up - s) // 2,
                name=f"upsamples_{i}", **conv_kw,
            )(c, deterministic)
            cs = 0.0
            for j, (k_res, dils) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilations)
            ):
                cs += HiFiGANResidualBlock(
                    kernel_size=k_res, channels=out_ch, dilations=tuple(dils),
                    bias=self.bias,
                    use_additional_convs=self.use_additional_convs,
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=act_params,
                    use_weight_norm=self.use_weight_norm, kernel_init=kinit,
                    name=f"blocks_{i * num_blocks + j}",
                )(c, deterministic)
            c = cs / num_blocks
        c = nn.leaky_relu(c, negative_slope=0.01)
        c = Conv1d(
            self.out_channels, self.kernel_size,
            padding=(self.kernel_size - 1) // 2, name="output_conv", **conv_kw,
        )(c, deterministic)
        return jnp.tanh(c)


class _TokenEmbedBase(nn.Module):
    """Token (+speaker) embedding front-end shared by discrete variants."""

    in_channels: int = 512
    num_embs: int = 100
    num_spk_embs: int = 128
    spk_emb_dim: int = 128
    concat_spk_emb: bool = False
    use_embedding_feats: bool = False
    emb_pad: int = 0  # extra embedding rows (duration variant uses 1)

    @property
    def _n_embs(self) -> int:
        return self.num_embs + self.emb_pad

    def _embed_tokens(self, c):
        """c (B, T, 2|1) int tokens (or (B, T, C) float feats) -> (B, T, C')."""
        if self.num_spk_embs > 0:
            assert c.shape[-1] == 2
            c_idx = c[..., 0].astype(jnp.int32)
            g_idx = c[..., 1].astype(jnp.int32)[:, 0]
            emb = nn.Embed(
                self._n_embs, self.in_channels,
                embedding_init=nn.initializers.normal(1.0), name="emb",
            )
            spk_emb = nn.Embed(
                self.num_spk_embs, self.spk_emb_dim,
                embedding_init=nn.initializers.normal(1.0), name="spk_emb",
            )
            x = emb(c_idx)
            g = spk_emb(g_idx)  # (B, D)
            if not self.concat_spk_emb:
                assert self.in_channels == self.spk_emb_dim
                x = x + g[:, None, :]
            else:
                g = jnp.broadcast_to(
                    g[:, None, :], (x.shape[0], x.shape[1], g.shape[-1])
                )
                x = jnp.concatenate([x, g], axis=-1)
            return x
        if self.use_embedding_feats:
            return c
        assert c.shape[-1] == 1
        emb = nn.Embed(
            self._n_embs, self.in_channels,
            embedding_init=nn.initializers.normal(1.0), name="emb",
        )
        return emb(c[..., 0].astype(jnp.int32))


class DiscreteSymbolHiFiGANGenerator(_TokenEmbedBase):
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
    use_weight_norm: bool = True

    # the F0 subclass sets this False to mirror the reference's re-declared
    # plain input conv (hifigan.py:1393-1400)
    _input_conv_weight_norm: bool = True

    def _trunk(self):
        return _HiFiGANTrunk(
            out_channels=self.out_channels,
            channels=self.channels,
            kernel_size=self.kernel_size,
            upsample_scales=self.upsample_scales,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            resblock_kernel_sizes=self.resblock_kernel_sizes,
            resblock_dilations=self.resblock_dilations,
            use_additional_convs=self.use_additional_convs,
            bias=self.bias,
            nonlinear_activation=self.nonlinear_activation,
            nonlinear_activation_params=self.nonlinear_activation_params,
            use_weight_norm=self.use_weight_norm,
            input_conv_weight_norm=self._input_conv_weight_norm,
            name="trunk",
        )

    @nn.compact
    def __call__(self, c, deterministic: bool = True):
        """c (B, T, 2) [token, spk] ints -> (B, T*prod(scales), out)."""
        x = self._embed_tokens(c)
        return self._trunk()(x, deterministic)


class DiscreteSymbolDurationGenerator(DiscreteSymbolHiFiGANGenerator):
    """Teacher-forced forward(c, ds); synthesis() uses predicted durations."""

    duration_layers: int = 2
    duration_chans: int = 384
    duration_kernel_size: int = 3
    duration_offset: float = 1.0
    duration_dropout_rate: float = 0.5
    max_reg_len: int = 2048  # static length-regulated sequence length
    emb_pad: int = 1  # reference reserves one extra row for padding

    def _dp(self):
        return DurationPredictor(
            n_layers=self.duration_layers,
            n_chans=self.duration_chans,
            kernel_size=self.duration_kernel_size,
            dropout_rate=self.duration_dropout_rate,
            offset=self.duration_offset,
            name="duration_predictor",
        )

    @nn.compact
    def __call__(self, c, ds=None, deterministic: bool = True):
        """c (B, T, 2); ds (B, T) int durations (teacher forcing).

        Returns (wave, predicted log-durations). The regulated length is
        static (max_reg_len) for jit-friendliness; callers mask/crop by
        sum(ds) * upsample_factor.
        """
        x = self._embed_tokens(c)
        dp = self._dp()
        ds_out = dp(x, deterministic)
        if ds is None:  # predicted durations (synthesis)
            ds = dp.inference(x)
        x, _ = length_regulator(x, ds, self.max_reg_len)
        return self._trunk()(x, deterministic), ds_out


class DiscreteSymbolF0Generator(DiscreteSymbolHiFiGANGenerator):
    """+ f0 linear embedding concat; optional per-layer embeddings with a
    learned softmax weight-sum over L HuBERT layers."""

    linear_channel: int = 256
    use_weight_sum: bool = False
    layer_num: int = 12
    use_fix_weight: bool = False
    use_f0: bool = True
    _input_conv_weight_norm: bool = False  # reference hifigan.py:1393-1400

    @nn.compact
    def __call__(self, c, f0=None, deterministic: bool = True):
        """c (B, T, 2|1|L) tokens or (B, T, C) feats; f0 (B, T, 1)."""
        if self.num_spk_embs > 0 or self.use_embedding_feats or not self.use_weight_sum:
            x = self._embed_tokens(c)
        else:
            assert c.shape[-1] == self.layer_num
            embs = [
                nn.Embed(
                    self.num_embs, self.in_channels,
                    embedding_init=nn.initializers.normal(1.0),
                    name=f"emb_{i}",
                )(c[..., i].astype(jnp.int32))
                for i in range(self.layer_num)
            ]
            stacked = jnp.stack(embs, axis=-1)  # (B, T, C, L)
            weights = self.param(
                "weights", lambda rng: jnp.ones((self.layer_num,))
            )
            if self.use_fix_weight:
                norm_w = jax.lax.stop_gradient(weights)
            else:
                norm_w = jax.nn.softmax(weights)
            x = jnp.einsum("btcl,l->btc", stacked, norm_w)
        if f0 is not None and self.use_f0:
            f0e = Dense(self.linear_channel, name="f0_embedding")(f0)
            x = jnp.concatenate([x, f0e], axis=-1)
        return self._trunk()(x, deterministic)


class DiscreteSymbolStyleMelGANGenerator(_TokenEmbedBase):
    """Token+speaker embeddings -> StyleMelGAN trunk."""

    in_channels: int = 128  # noise channels (overrides base default)
    aux_channels: int = 128
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

    @nn.compact
    def __call__(self, c, z=None, deterministic: bool = True):
        """c (B, T, 2) [token, spk] -> (B, T*prod(scales), out)."""
        # the style-melgan variant always has speaker embeddings; embed with
        # aux_channels-dim token table
        assert c.shape[-1] == 2
        c_idx = c[..., 0].astype(jnp.int32)
        g_idx = c[..., 1].astype(jnp.int32)[:, 0]
        emb = nn.Embed(
            self.num_embs, self.aux_channels,
            embedding_init=nn.initializers.normal(1.0), name="emb",
        )
        spk_emb = nn.Embed(
            self.num_spk_embs, self.spk_emb_dim,
            embedding_init=nn.initializers.normal(1.0), name="spk_emb",
        )
        x = emb(c_idx)
        g = spk_emb(g_idx)
        if not self.concat_spk_emb:
            assert self.aux_channels == self.spk_emb_dim
            x = x + g[:, None, :]
        else:
            g = jnp.broadcast_to(
                g[:, None, :], (x.shape[0], x.shape[1], g.shape[-1])
            )
            x = jnp.concatenate([x, g], axis=-1)
        aux_ch = (
            self.aux_channels + self.spk_emb_dim
            if self.concat_spk_emb
            else self.aux_channels
        )
        return StyleMelGANGenerator(
            in_channels=self.in_channels,
            aux_channels=aux_ch,
            channels=self.channels,
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            bias=self.bias,
            noise_upsample_scales=self.noise_upsample_scales,
            noise_upsample_activation=self.noise_upsample_activation,
            noise_upsample_activation_params=self.noise_upsample_activation_params,
            upsample_scales=self.upsample_scales,
            upsample_mode=self.upsample_mode,
            gated_function=self.gated_function,
            use_weight_norm=self.use_weight_norm,
            name="trunk",
        )(x, z, deterministic)
