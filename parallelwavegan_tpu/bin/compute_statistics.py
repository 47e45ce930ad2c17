#!/usr/bin/env python3
"""Compute mean/scale statistics of dumped mels (behavioral parity:
/root/reference/parallel_wavegan/bin/compute_statistics.py; the sklearn
StandardScaler.partial_fit is replaced by an exact running-moment
accumulator)."""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
from tqdm import tqdm

from parallelwavegan_tpu.datasets import MelDataset, MelSCPDataset
from parallelwavegan_tpu.utils.io import load_config, read_hdf5, write_hdf5


class RunningStats:
    """Exact streaming mean/variance over frames (Welford/Chan batched)."""

    def __init__(self):
        self.n = 0
        self.mean = None
        self.m2 = None

    def update(self, x: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        n_b = x.shape[0]
        mean_b = x.mean(axis=0)
        m2_b = ((x - mean_b) ** 2).sum(axis=0)
        if self.mean is None:
            self.n, self.mean, self.m2 = n_b, mean_b, m2_b
            return
        delta = mean_b - self.mean
        tot = self.n + n_b
        self.mean = self.mean + delta * n_b / tot
        self.m2 = self.m2 + m2_b + delta**2 * self.n * n_b / tot
        self.n = tot

    @property
    def scale(self):
        return np.sqrt(self.m2 / self.n)


def main():
    parser = argparse.ArgumentParser(
        description="Compute mean/scale of dumped features."
    )
    parser.add_argument("--feats-scp", "--scp", default=None, type=str)
    parser.add_argument("--rootdir", type=str, default=None)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--dumpdir", default=None, type=str, required=True)
    parser.add_argument(
        "--target-feats", type=str, default="feats",
        choices=["feats", "local"],
        help="which dumped feature key to accumulate statistics over",
    )
    parser.add_argument(
        "--utt2spk", default=None, type=str,
        help="kaldi-style utt2spk; if given, also write per-speaker "
        "statistics as stats-<spk>.h5 (reference "
        "bin/compute_statistics.py:163-192)",
    )
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    config = load_config(args.config)

    tf = args.target_feats
    if (args.feats_scp is None) == (args.rootdir is None):
        raise ValueError("Please specify either --rootdir or --feats-scp.")
    if args.feats_scp is None:
        if config["format"] == "hdf5":
            dataset = MelDataset(
                args.rootdir, "*.h5", lambda f: read_hdf5(f, tf),
                return_utt_id=args.utt2spk is not None,
            )
        elif config["format"] == "npy":
            dataset = MelDataset(
                args.rootdir, f"*-{tf}.npy", np.load,
                return_utt_id=args.utt2spk is not None,
            )
        else:
            raise ValueError("support only hdf5 or npy format.")
    else:
        dataset = MelSCPDataset(
            args.feats_scp, return_utt_id=args.utt2spk is not None
        )
    logging.info(f"The number of files = {len(dataset)}.")

    utt2spk = None
    if args.utt2spk is not None:
        with open(args.utt2spk) as f:
            utt2spk = dict(line.split()[:2] for line in f if line.strip())

    def save(stats, name):
        if config["format"] == "hdf5":
            path = os.path.join(args.dumpdir, f"{name}.h5")
            write_hdf5(path, "mean", stats.mean.astype(np.float32))
            write_hdf5(path, "scale", stats.scale.astype(np.float32))
        else:
            np.save(
                os.path.join(args.dumpdir, f"{name}.npy"),
                np.stack([stats.mean, stats.scale]).astype(np.float32),
                allow_pickle=False,
            )

    os.makedirs(args.dumpdir, exist_ok=True)
    stats = RunningStats()
    per_spk = {}
    for item in tqdm(dataset):
        if utt2spk is not None:
            utt_id, mel = item
            spk = utt2spk.get(utt_id)
            if spk is not None:
                per_spk.setdefault(spk, RunningStats()).update(mel)
        else:
            mel = item
        stats.update(mel)

    base = "stats" if tf == "feats" else f"stats-{tf}"
    save(stats, base)
    for spk, s in per_spk.items():
        save(s, f"{base}-{spk}")


if __name__ == "__main__":
    main()
