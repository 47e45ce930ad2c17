#!/usr/bin/env python3
"""Decode CLI: mel -> waveform with a trained model (behavioral parity:
/root/reference/parallel_wavegan/bin/decode.py:31-394, improved with
batched bucketed synthesis)."""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np
from tqdm import tqdm

from parallelwavegan_tpu.datasets import MelDataset, MelSCPDataset
from parallelwavegan_tpu.utils.io import load_config, read_hdf5, write_wav
from parallelwavegan_tpu.utils.model_loader import load_model


def main():
    parser = argparse.ArgumentParser(
        description="Decode dumped features with a trained vocoder."
    )
    parser.add_argument("--feats-scp", "--scp", default=None, type=str)
    parser.add_argument("--dumpdir", default=None, type=str)
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--config", default=None, type=str)
    parser.add_argument("--stats", default=None, type=str)
    parser.add_argument("--normalize-before", action="store_true")
    parser.add_argument("--batch-size", default=8, type=int)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    config = None
    if args.config is not None:
        config = load_config(args.config)

    if (args.feats_scp is None) == (args.dumpdir is None):
        raise ValueError("Please specify either --dumpdir or --feats-scp.")
    if args.normalize_before and args.stats is None:
        raise ValueError("--normalize-before requires --stats.")
    if args.feats_scp is None:
        cfg = config or load_config(
            os.path.join(os.path.dirname(args.checkpoint), "config.yml")
        )
        if cfg.get("format", "hdf5") == "hdf5":
            dataset = MelDataset(
                args.dumpdir, "*.h5", lambda f: read_hdf5(f, "feats"),
                return_utt_id=True,
            )
        else:
            dataset = MelDataset(
                args.dumpdir, "*-feats.npy", np.load, return_utt_id=True
            )
    else:
        dataset = MelSCPDataset(args.feats_scp, return_utt_id=True)
    logging.info(f"The number of features to be decoded = {len(dataset)}.")

    model = load_model(args.checkpoint, config, stats=args.stats)
    config = model.config
    sr = config.get("sampling_rate", 22050)

    os.makedirs(args.outdir, exist_ok=True)
    total_rtf = 0.0
    items = list(dataset)
    n_done = 0
    with tqdm(total=len(items)) as pbar:
        for i in range(0, len(items), args.batch_size):
            chunk = items[i : i + args.batch_size]
            utt_ids = [u for u, _ in chunk]
            mels = [m for _, m in chunk]
            start = time.time()
            waves = model.synthesize_batch(
                mels, normalize_before=args.normalize_before
            )
            elapsed = time.time() - start
            audio_s = sum(len(w) for w in waves) / sr
            total_rtf += elapsed / audio_s * len(chunk)
            for utt_id, w in zip(utt_ids, waves):
                write_wav(
                    os.path.join(args.outdir, f"{utt_id}_gen.wav"),
                    w[:, 0], sr,
                )
            n_done += len(chunk)
            pbar.update(len(chunk))

    logging.info(
        f"Finished generation of {n_done} utterances "
        f"(RTF = {total_rtf / max(n_done, 1):.06f})."
    )


if __name__ == "__main__":
    main()
