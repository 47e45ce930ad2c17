"""Vector-quantization codebook (behavioral parity:
/root/reference/parallel_wavegan/layers/vector_quantize_codebook.py:17-72)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class VQCodebook(nn.Module):
    """Codebook with straight-through estimator.

    Embedding init U(+-1/num_embeddings), matching the reference.
    """

    num_embeddings: int
    embedding_dim: int

    def setup(self):
        bound = 1.0 / self.num_embeddings
        self.embedding = self.param(
            "embedding",
            lambda rng, shape: jax.random.uniform(
                rng, shape, minval=-bound, maxval=bound
            ),
            (self.num_embeddings, self.embedding_dim),
        )

    def __call__(self, z):
        """Nearest indices for z (B, T, D) -> (B, T)."""
        dist = (
            jnp.sum(z**2, -1, keepdims=True)
            - 2.0 * z @ self.embedding.T
            + jnp.sum(self.embedding**2, -1)[None, None, :]
        )
        return jnp.argmin(dist, axis=-1)

    def straight_through(self, z):
        """Return (decoder input with STE gradient, quantized embedding)."""
        idx = self(z)
        z_q = jnp.take(self.embedding, idx, axis=0)
        z_q_st = z + jax.lax.stop_gradient(z_q - z)
        return z_q_st, z_q

    def lookup(self, idx):
        return jnp.take(self.embedding, idx, axis=0)
