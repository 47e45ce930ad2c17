"""Checkpoint save/load: single-file msgpack with the same logical contents
as the reference's torch pickle (model G+D, both optimizers, steps —
/root/reference/parallel_wavegan/bin/train.py:118-191), plus loaders for the
reference's own .pkl checkpoints via the torch importer."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from parallelwavegan_tpu.engine.state import GANTrainState


def save_checkpoint(path: str, state: GANTrainState) -> None:
    folder = os.path.dirname(path)
    if folder:
        os.makedirs(folder, exist_ok=True)
    host_state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_state))


def load_checkpoint(path: str, template: GANTrainState) -> GANTrainState:
    """Restore a checkpoint into the structure of `template`."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_params_only(path: str, template: GANTrainState,
                     load_discriminator: bool = True) -> GANTrainState:
    """--pretrain semantics: restore model params, keep fresh optimizers."""
    restored = load_checkpoint(path, template)
    out = template.replace(params_g=restored.params_g,
                           extra_g=restored.extra_g)
    if load_discriminator:
        out = out.replace(params_d=restored.params_d,
                          extra_d=restored.extra_d)
    return out


def load_reference_checkpoint(
    path: str, config: Dict[str, Any]
) -> Dict[str, Any]:
    """Load a reference torch checkpoint-<N>steps.pkl -> variable dicts.

    Returns {"generator": {"params": ...}, "discriminator": {...},
    "steps": int}.
    """
    from parallelwavegan_tpu.utils.torch_import import (
        import_model_params,
        load_torch_checkpoint,
    )

    ckpt = load_torch_checkpoint(path)
    out: Dict[str, Any] = {"steps": int(ckpt.get("steps", 0))}
    out["generator"] = import_model_params(
        ckpt["model"]["generator"],
        config.get("generator_type", "ParallelWaveGANGenerator"),
        config.get("generator_params", {}),
    )
    if "discriminator" in ckpt.get("model", {}):
        out["discriminator"] = import_model_params(
            ckpt["model"]["discriminator"],
            config.get("discriminator_type", "ParallelWaveGANDiscriminator"),
            config.get("discriminator_params", {}),
        )
    return out
