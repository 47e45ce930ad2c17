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
    """Restore a checkpoint into the structure of `template`.

    Handles the EMA field across format generations: a pre-EMA checkpoint
    restored into an EMA-enabled template seeds the EMA stream from the
    restored generator params; an EMA checkpoint restored into an
    EMA-disabled template drops the EMA tensors.
    """
    with open(path, "rb") as f:
        state_dict = serialization.msgpack_restore(f.read())
    tdict = serialization.to_state_dict(template)
    if tdict.get("ema_g") is None:
        state_dict["ema_g"] = None
    elif state_dict.get("ema_g") is None:
        state_dict["ema_g"] = jax.tree.map(
            np.copy, state_dict["params_g"]
        )
    return serialization.from_state_dict(template, state_dict)


def load_params_only(path: str, template: GANTrainState,
                     load_discriminator: bool = True) -> GANTrainState:
    """--pretrain semantics: restore model params, keep fresh optimizers.

    Also accepts a generator-only ``.gckpt`` (the distribution artifact of
    ``save_generator_checkpoint``): the generator warm-starts from it and
    the discriminator/optimizers stay fresh — the fine-tuning shape of the
    reference's --pretrain + strict=False discriminator load
    (/root/reference/parallel_wavegan/bin/train.py:152-191).
    """
    if path.endswith(".gckpt"):
        variables = load_generator_checkpoint(path)
        variables.pop("ema", None)  # raw params warm-start; EMA reseeds
        params_g = variables.pop("params")
        # .gckpt may be stored in bf16 for distribution; training keeps
        # f32 master params, so cast each leaf to the template's dtype
        cast = jax.tree.map(
            lambda new, ref: np.asarray(new).astype(np.asarray(ref).dtype),
            params_g, jax.device_get(template.params_g),
        )
        template_extra = jax.device_get(template.extra_g)
        t_struct = jax.tree.structure(template_extra)
        c_struct = jax.tree.structure(variables)
        if t_struct != c_struct:
            # e.g. a params-only .gckpt loaded into a model with extra
            # collections (or vice versa): fail with names, not an opaque
            # tree-structure error
            raise ValueError(
                "checkpoint non-param collections do not match the model: "
                f"checkpoint has {sorted(variables)}, model expects "
                f"{sorted(template_extra)} (structures {c_struct} vs "
                f"{t_struct})"
            )
        extra_g = jax.tree.map(
            lambda new, ref: np.asarray(new).astype(np.asarray(ref).dtype),
            variables, template_extra,
        )
        out = template.replace(params_g=cast, extra_g=extra_g)
        if template.ema_g is not None:
            out = out.replace(ema_g=jax.tree.map(np.copy, cast))
        return out
    restored = load_checkpoint(path, template)
    out = template.replace(params_g=restored.params_g,
                           extra_g=restored.extra_g,
                           ema_g=restored.ema_g)
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


def save_generator_checkpoint(path: str, state_or_variables,
                              dtype=None, use_ema: bool = False) -> None:
    """Inference-only checkpoint: just the generator variables.

    A full GANTrainState checkpoint carries the discriminator and both
    optimizer states (~17x the generator bytes for HiFiGAN V1: 969 MB vs
    56 MB) — serving and distribution only need the generator (the
    reference ships exactly this in its pretrained zoo,
    utils/utils.py:294-360). Self-describing msgpack, no template needed
    to restore; `load_model` accepts the .gckpt path directly.
    dtype=jnp.bfloat16 halves the artifact size (quality delta measured
    in docs/VALIDATION.md).
    """
    if isinstance(state_or_variables, GANTrainState):
        s = state_or_variables
        params = s.params_g
        if use_ema:
            assert s.ema_g is not None, (
                "use_ema=True but the train state has no EMA stream "
                "(set generator_ema_decay in the training config)"
            )
            params = s.ema_g
        variables = {"params": params, **s.extra_g}
    else:
        assert not use_ema, "use_ema only applies to a GANTrainState"
        variables = state_or_variables
    variables = jax.device_get(variables)
    if dtype is not None:
        variables = jax.tree.map(
            lambda x: x.astype(dtype)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            variables,
        )
    folder = os.path.dirname(path)
    if folder:
        os.makedirs(folder, exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))


def load_generator_checkpoint(path: str) -> Dict[str, Any]:
    """Restore generator variables from a .gckpt (see above)."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
