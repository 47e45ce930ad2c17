"""VQ-VAE wav2wav model (behavioral parity:
/root/reference/parallel_wavegan/models/vqvae.py:16-171).

Encoder = MelGANDiscriminator downsampling tower (last feature map),
codebook = VQ with straight-through estimator, decoder = MelGANGenerator.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from parallelwavegan_tpu.layers import Conv1d, VQCodebook
from parallelwavegan_tpu.models.melgan import MelGANDiscriminator, MelGANGenerator


class VQVAE(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    num_embeds: int = 512
    embed_dim: int = 256
    num_local_embeds: Optional[int] = None
    local_embed_dim: Optional[int] = None
    num_global_embeds: Optional[int] = None
    global_embed_dim: Optional[int] = None
    encoder_type: str = "MelGANDiscriminator"
    decoder_type: str = "MelGANGenerator"
    encoder_conf: Optional[Dict[str, Any]] = None
    decoder_conf: Optional[Dict[str, Any]] = None
    use_weight_norm: bool = True

    def setup(self):
        assert self.encoder_type == "MelGANDiscriminator"
        assert self.decoder_type == "MelGANGenerator"
        enc_conf = dict(
            self.encoder_conf
            or {
                "out_channels": 256,
                "downsample_scales": [4, 4, 2, 2],
                "max_downsample_channels": 1024,
            }
        )
        enc_conf["in_channels"] = self.in_channels
        enc_conf["out_channels"] = self.embed_dim
        enc_conf.setdefault("use_weight_norm", self.use_weight_norm)
        dec_conf = dict(
            self.decoder_conf
            or {
                "in_channels": 256,
                "upsample_scales": [4, 4, 2, 2],
                "channels": 512,
                "stacks": 3,
            }
        )
        dec_conf["out_channels"] = self.out_channels
        dec_conf.setdefault("use_weight_norm", self.use_weight_norm)
        self.encoder = MelGANDiscriminator(**enc_conf)
        self.codebook = VQCodebook(
            num_embeddings=self.num_embeds, embedding_dim=self.embed_dim
        )
        self.decoder = MelGANGenerator(**dec_conf)
        if self.num_local_embeds is not None and self.local_embed_dim is not None:
            self.local_embed = Conv1d(self.local_embed_dim, 1)
        else:
            self.local_embed = None
        if self.num_global_embeds is not None:
            self.global_embed = nn.Embed(
                self.num_global_embeds, self.global_embed_dim,
                embedding_init=nn.initializers.normal(1.0),
            )
        else:
            self.global_embed = None

    def _condition(self, z, l, g, deterministic):
        if l is not None:
            if self.local_embed is not None:
                l = self.local_embed(l, deterministic)
            z = jnp.concatenate([z, l], axis=-1)
        if g is not None:
            ge = self.global_embed(g)  # (B, D)
            ge = jnp.broadcast_to(
                ge[:, None, :], (z.shape[0], z.shape[1], ge.shape[-1])
            )
            z = jnp.concatenate([z, ge], axis=-1)
        return z

    def __call__(self, x, l=None, g=None, deterministic: bool = True):
        """x (B, T, in); l (B, T', local); g (B,) int.

        Returns (x_bar, z_e, z_q): reconstruction + encoder/quantized latents.
        """
        z_e = self.encoder(x, deterministic)[-1]
        z_q_st, z_q = self.codebook.straight_through(z_e)
        z = self._condition(z_q_st, l, g, deterministic)
        x_bar = self.decoder(z, deterministic)
        return x_bar, z_e, z_q

    def encode(self, x, deterministic: bool = True):
        """x (B, T, in) -> codebook indices (B, T')."""
        z_e = self.encoder(x, deterministic)[-1]
        return self.codebook(z_e)

    def decode(self, indices, l=None, g=None, deterministic: bool = True):
        """Indices (B, T') -> wave (B, T, out)."""
        z_q = self.codebook.lookup(indices)
        z = self._condition(z_q, l, g, deterministic)
        return self.decoder(z, deterministic)
