#!/usr/bin/env python3
"""Generate a tiny synthetic sine corpus for the debug recipe."""

import argparse
import os

import numpy as np
import yaml

from parallelwavegan_tpu.utils.io import write_wav


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--n-utts", type=int, default=12)
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()

    with open(args.config) as f:
        config = yaml.safe_load(f)
    sr = config["sampling_rate"]

    rng = np.random.default_rng(0)
    splits = {"train": range(args.n_utts), "dev": range(4), "eval": range(4)}
    for split, idxs in splits.items():
        outdir = os.path.join(args.outdir, split)
        os.makedirs(outdir, exist_ok=True)
        scp = []
        for i in idxs:
            dur = 1.0 + 0.25 * (i % 3)
            t = np.arange(int(sr * dur))
            f = 110.0 * (1 + (i % 5))
            wave = 0.4 * np.sin(2 * np.pi * f * t / sr)
            wave += 0.1 * np.sin(2 * np.pi * 2 * f * t / sr)
            wave *= 0.5 * (1 - np.cos(2 * np.pi * t / len(t)))  # envelope
            wave += 0.01 * rng.standard_normal(len(t))
            path = os.path.join(outdir, f"{split}_utt{i}.wav")
            write_wav(path, wave.astype(np.float32), sr)
            scp.append(f"{split}_utt{i} {os.path.abspath(path)}")
        with open(os.path.join(outdir, "wav.scp"), "w") as fh:
            fh.write("\n".join(scp) + "\n")
    print(f"Generated corpus under {args.outdir}")


if __name__ == "__main__":
    main()
