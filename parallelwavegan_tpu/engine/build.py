"""Build models/optimizers/initial state from a reference-compatible config
(the typed analogue of the reference's getattr factory,
/root/reference/parallel_wavegan/bin/train.py:1428-1567)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.engine.state import GANTrainState
from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.optimizers import build_optimizer


def _to_hashable(params: Dict[str, Any]) -> Dict[str, Any]:
    """YAML lists -> tuples so flax dataclass fields stay hashable."""
    out = {}
    for k, v in params.items():
        if isinstance(v, list):
            out[k] = tuple(
                tuple(x) if isinstance(x, list) else x for x in v
            )
        else:
            out[k] = v
    return out


def build_models(config: Dict[str, Any]):
    gen_type = config.get("generator_type", "ParallelWaveGANGenerator")
    gen_cls = get_model_class(gen_type)
    dis_cls = get_model_class(
        config.get("discriminator_type", "ParallelWaveGANDiscriminator")
    )
    gen_params = dict(config.get("generator_params", {}))
    if "Duration" in gen_type and "hop_size" in config:
        # training windows are contiguous token spans, so the regulated
        # length is exactly the window's frame count; pin the static
        # length-regulator size to it so y_hat matches y
        steps = config.get("batch_max_steps", 8192)
        steps -= steps % config["hop_size"]
        gen_params["max_reg_len"] = steps // config["hop_size"]
    generator = gen_cls(**_to_hashable(gen_params))
    discriminator = dis_cls(
        **_to_hashable(config.get("discriminator_params", {}))
    )
    return generator, discriminator


def example_batch(config: Dict[str, Any], batch_size: int = 2
                  ) -> Dict[str, np.ndarray]:
    """Tiny batch with the training shapes, for model init / dry runs."""
    gen_type = config.get("generator_type", "ParallelWaveGANGenerator")
    gp = config.get("generator_params", {})
    hop = config.get("hop_size", 256)
    steps = config.get("batch_max_steps", 8192)
    steps -= steps % hop
    frames = steps // hop
    ctx = gp.get("aux_context_window", 0)
    num_mels = config.get("num_mels", gp.get("aux_channels", 80))
    rng = np.random.default_rng(0)
    batch: Dict[str, np.ndarray] = {
        "y": rng.standard_normal((batch_size, steps, 1)).astype(np.float32)
        * 0.1,
    }
    if gen_type == "VQVAE":
        if config.get("use_global_condition", False):
            batch["g"] = np.zeros((batch_size,), np.int32)
        if config.get("use_local_condition", False):
            local_dim = gp.get("num_local_embeds") or 2
            batch["l"] = rng.standard_normal(
                (batch_size, frames, local_dim)
            ).astype(np.float32)
        return batch
    if "Duration" in gen_type:
        batch["c"] = np.ones((batch_size, frames, 2), np.int32)
        batch["ds"] = np.ones((batch_size, frames), np.int32)
        return batch
    if "DiscreteSymbol" in gen_type:
        batch["c"] = np.ones((batch_size, frames, 2), np.int32)
        return batch
    batch["c"] = rng.standard_normal(
        (batch_size, frames + 2 * ctx, num_mels)
    ).astype(np.float32)
    if gen_type == "ParallelWaveGANGenerator":
        batch["z"] = rng.standard_normal(
            (batch_size, steps, gp.get("in_channels", 1))
        ).astype(np.float32)
    if gen_type == "UHiFiGANGenerator":
        batch["excitation"] = rng.standard_normal(
            (batch_size, steps, 1)
        ).astype(np.float32)
        batch["f0"] = np.abs(
            rng.standard_normal((batch_size, frames, 1))
        ).astype(np.float32)
    if gen_type == "DiscreteSymbolF0Generator":
        batch["f0"] = np.abs(
            rng.standard_normal((batch_size, frames, 1))
        ).astype(np.float32)
    return batch


def init_train_state(
    config: Dict[str, Any], rng: jax.Array, batch=None
) -> Tuple[GANTrainState, Any, Any, Any, Any]:
    """Initialize (state, generator, discriminator, opt_g, opt_d)."""
    from parallelwavegan_tpu.engine.step import make_generator_forward

    generator, discriminator = build_models(config)
    if batch is None:
        batch = example_batch(config)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    r_g, r_d, r_fwd = jax.random.split(rng, 3)
    gen_forward = make_generator_forward(config, generator)

    gen_vars = _init_generator(config, generator, r_g, batch)
    params_g = gen_vars.pop("params")
    extra_g = dict(gen_vars)

    # run one generator forward to get the waveform shape for D init
    y_hat, _ = gen_forward({"params": params_g, **extra_g}, batch, r_fwd, True)
    if config.get("generator_params", {}).get("out_channels", 1) > 1:
        from parallelwavegan_tpu.layers import PQMF

        y_hat = PQMF(
            subbands=config["generator_params"]["out_channels"],
            **config.get("pqmf_params", {}),
        ).synthesis(y_hat)
    dis_vars = discriminator.init(
        {"params": r_d, "window": r_d}, y_hat, True
    )
    params_d = dis_vars.pop("params")
    extra_d = dict(dis_vars)

    opt_g = build_optimizer(
        config.get("generator_optimizer_type", "RAdam"),
        config.get("generator_optimizer_params", {}),
        config.get("generator_scheduler_type", "StepLR"),
        config.get("generator_scheduler_params", {}),
        config.get("generator_grad_norm", -1),
    )
    opt_d = build_optimizer(
        config.get("discriminator_optimizer_type", "RAdam"),
        config.get("discriminator_optimizer_params", {}),
        config.get("discriminator_scheduler_type", "StepLR"),
        config.get("discriminator_scheduler_params", {}),
        config.get("discriminator_grad_norm", -1),
    )

    ema_g = None
    if float(config.get("generator_ema_decay", 0.0) or 0.0) > 0.0:
        # seed the EMA stream from the initial params (or, on resume /
        # legacy checkpoints, from the restored params — engine.checkpoint).
        # Real copies, not aliases: the train step donates the state, and
        # a twice-donated buffer is an XLA execution error.
        ema_g = jax.tree_util.tree_map(jnp.copy, params_g)
    state = GANTrainState(
        steps=jnp.asarray(0, jnp.int32),
        params_g=params_g,
        extra_g=extra_g,
        opt_g=opt_g.init(params_g),
        params_d=params_d,
        extra_d=extra_d,
        opt_d=opt_d.init(params_d),
        ema_g=ema_g,
    )
    return state, generator, discriminator, opt_g, opt_d


def _init_generator(config, generator, rng, batch):
    gen_type = config.get("generator_type", "ParallelWaveGANGenerator")
    rngs = {"params": rng, "dropout": rng, "noise": rng}
    if gen_type == "VQVAE":
        return generator.init(
            rngs, batch.get("x_vq", batch["y"]), batch.get("l"),
            batch.get("g"), True,
        )
    if "Duration" in gen_type:
        return generator.init(rngs, batch["c"], batch["ds"], True)
    if gen_type == "UHiFiGANGenerator":
        return generator.init(
            rngs, batch["c"], batch.get("f0"), batch.get("excitation"), True
        )
    if "StyleMelGAN" in gen_type:
        return generator.init(rngs, batch["c"], None, True)
    if gen_type == "DiscreteSymbolF0Generator":
        return generator.init(rngs, batch["c"], batch.get("f0"), True)
    if gen_type == "ParallelWaveGANGenerator":
        return generator.init(rngs, batch["z"], batch["c"], True)
    return generator.init(rngs, batch["c"], True)
