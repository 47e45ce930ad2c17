"""PQMF filterbank as a lightweight stateless module (filters are constants,
not parameters — analogous to the reference's registered buffers,
/root/reference/parallel_wavegan/layers/pqmf.py:51-149)."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from parallelwavegan_tpu.ops.pqmf import pqmf_analysis, pqmf_synthesis


@dataclass(frozen=True)
class PQMF:
    subbands: int = 4
    taps: int = 62
    cutoff_ratio: float = 0.142
    beta: float = 9.0

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 1) -> (B, T//subbands, subbands)."""
        return pqmf_analysis(
            x, self.subbands, self.taps, self.cutoff_ratio, self.beta
        )

    def synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T//subbands, subbands) -> (B, T, 1)."""
        return pqmf_synthesis(
            x, self.subbands, self.taps, self.cutoff_ratio, self.beta
        )
