#!/usr/bin/env python3
"""Export the committed quality artifact consumed by `BENCH_MODE=quality`.

Packages the trained rich_v1 generator (inference-only .gckpt, bf16
storage) together with the eval mels and ground-truth wavs into
assets/quality/ at the repo root, so the copy-synthesis MCD is computable
from a clean checkout without the 969 MB experiment directory (the
reference's analogue is the pretrained zoo + bin/evaluate_mcd.py).
"""

import argparse
import glob
import os

import numpy as np

from parallelwavegan_tpu.engine.build import init_train_state
from parallelwavegan_tpu.engine.checkpoint import (
    load_checkpoint,
    save_generator_checkpoint,
)
from parallelwavegan_tpu.utils.io import (
    load_config,
    read_hdf5,
    save_config,
    write_wav,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", default="exp/rich_v1")
    p.add_argument("--dump", default="dump/eval")
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="defaults to the highest-step checkpoint in --exp")
    p.add_argument("--use-ema", action="store_true",
                   help="export the EMA generator stream instead of the "
                   "raw params (requires generator_ema_decay in the run)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    ckpt = args.checkpoint
    if ckpt is None:
        cs = sorted(
            glob.glob(os.path.join(args.exp, "checkpoint-*steps.ckpt")),
            key=lambda q: int(
                os.path.basename(q)[len("checkpoint-"):-len("steps.ckpt")]
            ),
        )
        ckpt = cs[-1]
    config = load_config(os.path.join(args.exp, "config.yml"))
    template = jax.eval_shape(
        lambda: init_train_state(config, jax.random.key(0))[0]
    )
    state = load_checkpoint(ckpt, template)

    os.makedirs(args.out, exist_ok=True)
    save_generator_checkpoint(
        os.path.join(args.out, "generator.gckpt"), state,
        dtype=jnp.bfloat16, use_ema=args.use_ema,
    )
    config["quality_asset_source_checkpoint"] = os.path.basename(ckpt)
    if args.use_ema:
        config["quality_asset_is_ema"] = True
    # keep the shipped config portable: no machine-specific absolute paths
    repo_root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "..", "..")
    )
    for key in ("pretrain", "resume", "outdir"):
        val = config.get(key)
        if isinstance(val, str) and os.path.isabs(val):
            config[key] = os.path.relpath(val, repo_root)
    save_config(os.path.join(args.out, "config.yml"), config)
    for f in sorted(glob.glob(os.path.join(args.dump, "norm/*.h5"))):
        utt = os.path.splitext(os.path.basename(f))[0]
        np.save(os.path.join(args.out, f"{utt}-feats.npy"),
                read_hdf5(f, "feats"))
        write_wav(
            os.path.join(args.out, f"{utt}-gt.wav"),
            read_hdf5(os.path.join(args.dump, "raw", utt + ".h5"), "wave"),
            config["sampling_rate"],
        )
    print(f"quality assets written to {args.out} (source {ckpt})")


if __name__ == "__main__":
    main()
