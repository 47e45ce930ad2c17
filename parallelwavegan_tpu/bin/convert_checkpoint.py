#!/usr/bin/env python3
"""Convert checkpoints between this framework and the reference toolkit.

Default direction: reference torch .pkl -> our .ckpt — the bridge to the
reference's 36-model pretrained zoo
(/root/reference/parallel_wavegan/utils/utils.py:22-58): download any
reference tag with the reference tooling, then convert here.

--to-reference: our .ckpt -> reference-loadable .pkl (generator only), so a
model trained on TPU can be served by the reference toolkit / ESPnet via
its `utils.load_model`."""

from __future__ import annotations

import argparse
import logging
import os

import jax

from parallelwavegan_tpu.engine.build import init_train_state
from parallelwavegan_tpu.engine.checkpoint import (
    load_reference_checkpoint,
    save_checkpoint,
)
from parallelwavegan_tpu.utils.io import load_config, save_config


def main():
    parser = argparse.ArgumentParser(
        description="Convert reference .pkl checkpoint to .ckpt."
    )
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--config", type=str, default=None,
                        help="config.yml (defaults to the one next to ckpt)")
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--to-reference", action="store_true",
                        help="export our .ckpt to a reference torch .pkl "
                             "(generator only) instead of importing")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    config_path = args.config or os.path.join(
        os.path.dirname(args.checkpoint), "config.yml"
    )
    config = load_config(config_path)

    if args.to_reference:
        from parallelwavegan_tpu.engine.checkpoint import load_checkpoint
        from parallelwavegan_tpu.utils.torch_export import (
            save_reference_checkpoint,
        )

        template = jax.eval_shape(
            lambda: init_train_state(config, jax.random.key(0))[0]
        )
        state = load_checkpoint(args.checkpoint, template)
        steps = int(state.steps)
        os.makedirs(args.outdir, exist_ok=True)
        out = os.path.join(args.outdir, f"checkpoint-{steps}steps.pkl")
        save_reference_checkpoint(out, state.params_g, config, steps=steps)
        save_config(os.path.join(args.outdir, "config.yml"), config)
        logging.info(f"Exported {args.checkpoint} -> {out}")
        return

    imported = load_reference_checkpoint(args.checkpoint, config)
    state, *_ = init_train_state(config, jax.random.key(0))
    state = state.replace(
        steps=jax.numpy.asarray(imported["steps"], jax.numpy.int32),
        params_g=imported["generator"]["params"],
        extra_g={k: v for k, v in imported["generator"].items()
                 if k != "params"},
    )
    if "discriminator" in imported:
        state = state.replace(
            params_d=imported["discriminator"]["params"],
            extra_d={k: v for k, v in imported["discriminator"].items()
                     if k != "params"},
        )

    os.makedirs(args.outdir, exist_ok=True)
    out = os.path.join(
        args.outdir, f"checkpoint-{imported['steps']}steps.ckpt"
    )
    save_checkpoint(out, state)
    save_config(os.path.join(args.outdir, "config.yml"), config)
    logging.info(f"Converted {args.checkpoint} -> {out}")


if __name__ == "__main__":
    main()
