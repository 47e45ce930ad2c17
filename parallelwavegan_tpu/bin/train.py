#!/usr/bin/env python3
"""Training CLI (behavioral parity:
/root/reference/parallel_wavegan/bin/train.py:947-1611).

Wires config -> datasets -> collater -> per-host sharded loaders ->
engine.Trainer, with resume/--pretrain, config.yml dump, and multi-host init
via jax.distributed (MASTER_ADDR-style rendezvous)."""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

from parallelwavegan_tpu.datasets import (
    AudioDataset,
    AudioGlobalDataset,
    AudioLocalDataset,
    AudioMelDataset,
    AudioMelF0Dataset,
    AudioMelF0ExcitationDataset,
    Collater,
)
from parallelwavegan_tpu.datasets.loader import DataLoader
from parallelwavegan_tpu.utils.io import load_config, read_hdf5, save_config


def build_scp_dataset(config, wav_scp, feats_scp, segments):
    """Kaldi-style scp inputs (reference bin/train.py:1255-1331): wav.scp +
    feats.scp (+ segments). Only the plain audio+mel path supports scp."""
    from parallelwavegan_tpu.datasets import AudioMelSCPDataset

    gen_type = config.get("generator_type", "ParallelWaveGANGenerator")
    if gen_type == "UHiFiGANGenerator":
        raise NotImplementedError(
            "SCP format is not supported for f0 and excitation."
        )
    if config.get("use_f0", False):
        raise NotImplementedError("SCP format is not supported for f0.")
    if gen_type == "VQVAE":
        raise NotImplementedError("SCP format is not supported for VQVAE.")
    mel_length_threshold = None
    if config.get("remove_short_samples", False):
        mel_length_threshold = (
            config["batch_max_steps"] // config["hop_size"]
            + 2 * config.get("generator_params", {}).get(
                "aux_context_window", 0
            )
        )
    return AudioMelSCPDataset(
        wav_scp=wav_scp,
        feats_scp=feats_scp,
        segments=segments,
        mel_length_threshold=mel_length_threshold,
        allow_cache=config.get("allow_cache", False),
    )


def build_dataset(config, rootdir):
    fmt = config.get("format", "hdf5")
    if fmt == "hdf5":
        audio_query, mel_query = "*.h5", "*.h5"
        audio_load_fn = lambda f: read_hdf5(f, "wave")  # noqa: E731
        mel_load_fn = lambda f: read_hdf5(f, "feats")  # noqa: E731
    elif fmt == "npy":
        audio_query, mel_query = "*-wave.npy", "*-feats.npy"
        audio_load_fn = np.load
        mel_load_fn = np.load
    else:
        raise ValueError("support only hdf5 or npy format.")
    hop_size = config["hop_size"]
    aux_context_window = config.get("generator_params", {}).get(
        "aux_context_window", 0
    )
    mel_length_threshold = None
    if config.get("remove_short_samples", False):
        mel_length_threshold = (
            config["batch_max_steps"] // hop_size + 2 * aux_context_window
        )
    gen_type = config.get("generator_type", "ParallelWaveGANGenerator")
    allow_cache = config.get("allow_cache", False)
    if gen_type == "VQVAE":
        # wav2wav path: raw audio windows (+ optional local/global cond)
        if config.get("use_local_condition", False):
            g_fn = None
            if config.get("use_global_condition", False):
                g_fn = (
                    (lambda f: read_hdf5(f, "global")) if fmt == "hdf5"
                    else (lambda f: np.load(
                        f.replace("-wave.npy", "-global.npy")))
                )
            return AudioLocalDataset(
                rootdir, audio_query=audio_query,
                audio_load_fn=audio_load_fn,
                local_load_fn=(
                    (lambda f: read_hdf5(f, "local")) if fmt == "hdf5"
                    else (lambda f: np.load(
                        f.replace("-wave.npy", "-local.npy")))
                ),
                global_load_fn=g_fn,
                audio_length_threshold=config["batch_max_steps"],
                allow_cache=allow_cache,
            )
        if config.get("use_global_condition", False):
            if fmt == "hdf5":
                return AudioGlobalDataset(
                    rootdir, audio_query=audio_query,
                    audio_load_fn=audio_load_fn,
                    audio_length_threshold=config["batch_max_steps"],
                    allow_cache=allow_cache,
                )
            return AudioGlobalDataset(
                rootdir, audio_query=audio_query,
                audio_load_fn=audio_load_fn,
                global_load_fn=lambda f: np.load(
                    f.replace("-wave.npy", "-global.npy")
                ),
                audio_length_threshold=config["batch_max_steps"],
                allow_cache=allow_cache,
            )
        return AudioDataset(
            rootdir, audio_query=audio_query, audio_load_fn=audio_load_fn,
            audio_length_threshold=config["batch_max_steps"],
            allow_cache=allow_cache,
        )
    common = dict(
        root_dir=rootdir,
        audio_query=audio_query,
        mel_query=mel_query,
        audio_load_fn=audio_load_fn,
        mel_load_fn=mel_load_fn,
        mel_length_threshold=mel_length_threshold,
        allow_cache=allow_cache,
    )
    if gen_type == "UHiFiGANGenerator":
        if fmt == "hdf5":
            return AudioMelF0ExcitationDataset(**common)
        return AudioMelF0ExcitationDataset(
            f0_load_fn=lambda f: np.load(
                f.replace("-wave.npy", "-f0.npy")
            ),
            excitation_load_fn=lambda f: np.load(
                f.replace("-wave.npy", "-excitation.npy")
            ),
            **common,
        )
    use_f0 = config.get("use_f0", False) or (
        gen_type == "DiscreteSymbolF0Generator"
        and config.get("generator_params", {}).get("use_f0", True)
    )
    if use_f0:
        if fmt == "hdf5":
            return AudioMelF0Dataset(**common)
        return AudioMelF0Dataset(
            f0_load_fn=lambda f: np.load(
                f.replace("-wave.npy", "-f0.npy")
            ),
            **common,
        )
    return AudioMelDataset(**common)


def _try_native_loader(config, dataset, seed, num_shards, shard_index):
    """Use the C++ loader (datasets/native_loader.py) when it applies:
    npy dumps, mel2wav batch layout, lib builds. Returns None otherwise."""
    from parallelwavegan_tpu.datasets import native_loader

    gen_type = config.get("generator_type", "ParallelWaveGANGenerator")
    setting = config.get("use_native_loader", "auto")
    eligible = (
        config.get("format", "hdf5") == "npy"
        and gen_type
        in ("ParallelWaveGANGenerator", "MelGANGenerator",
            "HiFiGANGenerator", "StyleMelGANGenerator")
        and not config.get("use_f0", False)
        and hasattr(dataset, "audio_files")
        and native_loader.is_available()
    )
    if setting == "auto" and not eligible:
        return None
    if not setting:
        return None
    pairs = list(zip(dataset.audio_files, dataset.mel_files))
    loader = native_loader.NativeMelWavLoader(
        pairs,
        batch_size=config["batch_size"] // num_shards,
        batch_max_steps=config["batch_max_steps"],
        hop_size=config["hop_size"],
        aux_context_window=config.get("generator_params", {}).get(
            "aux_context_window", 0
        ),
        use_noise_input=gen_type == "ParallelWaveGANGenerator",
        seed=seed,
        num_shards=num_shards,
        shard_index=shard_index,
    )
    logging.info("Using native (C++) data loader.")
    return loader


def build_loader(config, dataset, seed, num_shards, shard_index):
    gen_type = config.get("generator_type", "ParallelWaveGANGenerator")
    native = _try_native_loader(config, dataset, seed, num_shards, shard_index)
    if native is not None:
        return native
    is_vq = gen_type == "VQVAE"
    collater = Collater(
        batch_max_steps=config["batch_max_steps"],
        hop_size=config["hop_size"],
        aux_context_window=config.get("generator_params", {}).get(
            "aux_context_window", 0
        ),
        use_noise_input=gen_type == "ParallelWaveGANGenerator",
        use_duration="Duration" in gen_type,
        use_f0=config.get("use_f0", False)
        or (
            gen_type == "DiscreteSymbolF0Generator"
            and config.get("generator_params", {}).get("use_f0", True)
        ),
        use_f0_and_excitation=gen_type == "UHiFiGANGenerator",
        use_aux_input=not is_vq,
        use_global_condition=is_vq
        and config.get("use_global_condition", False),
        use_local_condition=is_vq
        and config.get("use_local_condition", False),
        rng=np.random.default_rng(seed + 1000 * shard_index),
    )
    return DataLoader(
        dataset,
        collater,
        batch_size=config["batch_size"] // num_shards,
        seed=seed,
        num_shards=num_shards,
        shard_index=shard_index,
        # reference configs carry num_workers (torch DataLoader workers);
        # map it onto the prefetch-queue depth (pin_memory has no TPU analogue)
        prefetch=max(2, min(int(config.get("num_workers", 2) or 0), 8)),
    )


def main():
    parser = argparse.ArgumentParser(
        description="Train a GAN vocoder (TPU-native)."
    )
    parser.add_argument("--train-dumpdir", default=None, type=str)
    parser.add_argument("--dev-dumpdir", default=None, type=str)
    parser.add_argument("--train-wav-scp", default=None, type=str)
    parser.add_argument("--train-feats-scp", default=None, type=str)
    parser.add_argument("--train-segments", default=None, type=str)
    parser.add_argument("--dev-wav-scp", default=None, type=str)
    parser.add_argument("--dev-feats-scp", default=None, type=str)
    parser.add_argument("--dev-segments", default=None, type=str)
    parser.add_argument("--use-f0", action="store_true",
                        help="train with per-frame f0 as an extra input")
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--resume", default="", type=str, nargs="?")
    parser.add_argument("--pretrain", default="", type=str, nargs="?")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    for split in ("train", "dev"):
        dumpdir = getattr(args, f"{split}_dumpdir")
        wav_scp = getattr(args, f"{split}_wav_scp")
        feats_scp = getattr(args, f"{split}_feats_scp")
        if dumpdir is None and (wav_scp is None or feats_scp is None):
            parser.error(
                f"--{split}-dumpdir or (--{split}-wav-scp and "
                f"--{split}-feats-scp) is required."
            )
        if dumpdir is not None and wav_scp is not None:
            parser.error(
                f"give --{split}-dumpdir OR --{split}-wav-scp, not both."
            )

    import jax

    from parallelwavegan_tpu.engine import Trainer
    from parallelwavegan_tpu.parallel import init_distributed
    from parallelwavegan_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    # without this every invocation re-pays multi-minute remote compiles of
    # the train-step variants (the bench's throughput was unreachable from
    # the CLI before)
    enable_persistent_compile_cache()
    init_distributed()

    # suppress logging of non-zero processes (reference train.py:1084-1086)
    if jax.process_index() == 0:
        level = logging.INFO if args.verbose else logging.WARN
    else:
        level = logging.ERROR
    logging.basicConfig(
        level=level, stream=sys.stdout,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    config = load_config(args.config)
    config.update(vars(args))
    config["version"] = "parallelwavegan_tpu-0.1.0"
    os.makedirs(args.outdir, exist_ok=True)
    if jax.process_index() == 0:
        save_config(os.path.join(args.outdir, "config.yml"), config)
        for key, value in config.items():
            logging.info(f"{key} = {value}")

    if args.train_dumpdir is not None:
        train_dataset = build_dataset(config, args.train_dumpdir)
    else:
        train_dataset = build_scp_dataset(
            config, args.train_wav_scp, args.train_feats_scp,
            args.train_segments,
        )
    if args.dev_dumpdir is not None:
        dev_dataset = build_dataset(config, args.dev_dumpdir)
    else:
        dev_dataset = build_scp_dataset(
            config, args.dev_wav_scp, args.dev_feats_scp, args.dev_segments,
        )
    logging.info(f"The number of training files = {len(train_dataset)}.")
    logging.info(f"The number of development files = {len(dev_dataset)}.")

    n_shards = jax.process_count()
    train_loader = build_loader(
        config, train_dataset, args.seed, n_shards, jax.process_index()
    )
    dev_loader = build_loader(
        config, dev_dataset, args.seed + 1, 1, 0
    )

    trainer = Trainer(
        config, train_loader, dev_loader, seed=args.seed, outdir=args.outdir
    )
    if args.pretrain:
        trainer.load_checkpoint(args.pretrain, load_only_params=True)
        logging.info(f"Successfully loaded parameters from {args.pretrain}.")
    if args.resume:
        trainer.load_checkpoint(args.resume)
        logging.info(f"Successfully resumed from {args.resume}.")

    trainer.run()


if __name__ == "__main__":
    main()
