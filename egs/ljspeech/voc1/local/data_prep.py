#!/usr/bin/env python3
"""Split LJSpeech wavs into train/dev/eval symlink dirs (reference split:
dev/eval = 250 utterances each, egs/ljspeech/voc1/run.sh data prep)."""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--db-root", type=str, required=True)
    parser.add_argument("--outdir", type=str, default="data")
    parser.add_argument("--num-dev", type=int, default=250)
    parser.add_argument("--num-eval", type=int, default=250)
    args = parser.parse_args()

    wav_dir = os.path.join(args.db_root, "wavs")
    wavs = sorted(
        f for f in os.listdir(wav_dir) if f.endswith(".wav")
    )
    n = len(wavs)
    assert n > args.num_dev + args.num_eval, "corpus too small"
    splits = {
        "train": wavs[: n - args.num_dev - args.num_eval],
        "dev": wavs[n - args.num_dev - args.num_eval : n - args.num_eval],
        "eval": wavs[n - args.num_eval :],
    }
    for split, files in splits.items():
        outdir = os.path.join(args.outdir, split)
        os.makedirs(outdir, exist_ok=True)
        for f in files:
            dst = os.path.join(outdir, f)
            if not os.path.exists(dst):
                os.symlink(os.path.abspath(os.path.join(wav_dir, f)), dst)
        print(f"{split}: {len(files)} utterances")


if __name__ == "__main__":
    main()
