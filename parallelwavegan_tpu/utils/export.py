"""Serving export: serialize a jitted synthesis function with jax.export.

The TPU-native analogue of the reference's TensorFlow export path
(/root/reference/parallel_wavegan/models/tf_models.py and
layers/tf_layers.py + the conversion notebook): instead of re-implementing
models in a second framework, the jitted generator is lowered to StableHLO
and serialized; any JAX/XLA runtime (or TF via jax2tf elsewhere) can execute
it without this package.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def export_generator(
    model,  # InferenceModel
    batch_size: int = 1,
    num_frames: int = 512,
    path: Optional[str] = None,
) -> bytes:
    """Export the synthesis function for a fixed (batch, frames) shape.

    Returns the serialized StableHLO bytes (also written to `path` if given).
    """
    from jax import export as jax_export

    gen = model.generator
    variables = model.variables
    pqmf = model.pqmf

    def synth(mel):
        y = gen.apply(variables, mel)
        if pqmf is not None:
            y = pqmf.synthesis(y)
        return y

    num_mels = model.config.get("num_mels", 80)
    spec = jax.ShapeDtypeStruct((batch_size, num_frames, num_mels),
                                jnp.float32)
    exported = jax_export.export(jax.jit(synth))(spec)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(blob: bytes):
    """Deserialize an exported generator; returns a callable."""
    from jax import export as jax_export

    exported = jax_export.deserialize(
        blob if isinstance(blob, bytearray) else bytearray(blob)
    )
    return exported.call
