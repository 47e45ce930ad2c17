#!/usr/bin/env python3
"""Normalize dumped mels with precomputed statistics (behavioral parity:
/root/reference/parallel_wavegan/bin/normalize.py: transform feats, keep
binary columns of `local` features un-normalized, copy waves through)."""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
from tqdm import tqdm

from parallelwavegan_tpu.datasets import AudioMelDataset
from parallelwavegan_tpu.utils.io import load_config, read_hdf5, write_hdf5


def main():
    parser = argparse.ArgumentParser(
        description="Normalize dumped features with mean/scale statistics."
    )
    parser.add_argument("--rootdir", type=str, required=True)
    parser.add_argument("--dumpdir", type=str, required=True)
    parser.add_argument("--stats", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--skip-wav-copy", action="store_true")
    parser.add_argument(
        "--target-feats", type=str, default="feats",
        choices=["feats", "local"],
        help="which dumped feature key to normalize; binary columns of "
        "'local' features are kept un-normalized (reference "
        "bin/normalize.py:274-278)",
    )
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    config = load_config(args.config)

    if args.stats.endswith(".h5"):
        mean = read_hdf5(args.stats, "mean").reshape(-1)
        scale = read_hdf5(args.stats, "scale").reshape(-1)
    else:
        arr = np.load(args.stats)
        mean, scale = arr[0].reshape(-1), arr[1].reshape(-1)

    tf = args.target_feats
    if config["format"] == "hdf5":
        dataset = AudioMelDataset(
            args.rootdir, "*.h5", "*.h5",
            lambda f: read_hdf5(f, "wave"), lambda f: read_hdf5(f, tf),
            return_utt_id=True,
        )
    elif config["format"] == "npy":
        dataset = AudioMelDataset(
            args.rootdir, "*-wave.npy", f"*-{tf}.npy", np.load, np.load,
            return_utt_id=True,
        )
    else:
        raise ValueError("support only hdf5 or npy format.")

    os.makedirs(args.dumpdir, exist_ok=True)
    # auxiliary keys copied through untouched (reference normalize.py keeps
    # f0/excitation/global alongside the normalized feats)
    extra_keys = tuple(
        k for k in ("f0", "excitation", "global") if k != tf
    )
    src_by_utt = dict(zip(dataset.utt_ids, dataset.mel_files))
    for utt_id, audio, mel in tqdm(dataset):
        mel_norm = (mel - mean) / scale
        if tf == "local":
            # binary columns (e.g. V/UV) pass through un-normalized
            is_binary = (
                np.logical_or(mel == 1, mel == 0).sum(axis=0) == len(mel)
            )
            mel_norm[:, is_binary] = mel[:, is_binary]
        if config["format"] == "hdf5":
            src = src_by_utt[utt_id]
            path = os.path.join(args.dumpdir, f"{utt_id}.h5")
            write_hdf5(path, tf, mel_norm.astype(np.float32))
            if not args.skip_wav_copy:
                write_hdf5(path, "wave", audio.astype(np.float32))
            import h5py

            with h5py.File(src, "r") as f:
                present = [k for k in extra_keys if k in f]
            for k in present:
                write_hdf5(path, k, read_hdf5(src, k))
        else:
            np.save(
                os.path.join(args.dumpdir, f"{utt_id}-{tf}.npy"),
                mel_norm.astype(np.float32), allow_pickle=False,
            )
            if not args.skip_wav_copy:
                np.save(
                    os.path.join(args.dumpdir, f"{utt_id}-wave.npy"),
                    audio.astype(np.float32), allow_pickle=False,
                )
            for k in extra_keys:
                src = src_by_utt[utt_id].replace("-feats.npy", f"-{k}.npy")
                if os.path.exists(src):
                    np.save(
                        os.path.join(args.dumpdir, f"{utt_id}-{k}.npy"),
                        np.load(src), allow_pickle=False,
                    )


if __name__ == "__main__":
    main()
