#!/usr/bin/env python3
"""Evaluate MCD between generated and ground-truth wavs (behavioral parity:
/root/reference/parallel_wavegan/bin/evaluate_mcd.py; multiprocessing over
utterances, writes utt2mcd + average)."""

from __future__ import annotations

import argparse
import logging
import multiprocessing as mp
import os

import numpy as np

from parallelwavegan_tpu.ops.eval_metrics import mel_cepstral_distortion
from parallelwavegan_tpu.utils.io import find_files, read_wav


def _one(pair):
    gen_path, gt_path = pair
    gen, fs_g = read_wav(gen_path)
    gt, fs_r = read_wav(gt_path)
    assert fs_g == fs_r, f"fs mismatch: {gen_path} vs {gt_path}"
    utt_id = os.path.basename(gen_path).replace("_gen.wav", "")
    return utt_id, mel_cepstral_distortion(gen, gt, fs_g)


def main():
    parser = argparse.ArgumentParser(description="Evaluate MCD.")
    parser.add_argument("--outdir", "--wavdir", dest="gen_wavdir", type=str,
                        required=True, help="dir with *_gen.wav")
    parser.add_argument("--gt-wavdir", type=str, required=True)
    parser.add_argument("--n-jobs", type=int, default=8)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    gen_files = find_files(args.gen_wavdir, "*_gen.wav")
    gt_index = {
        os.path.splitext(os.path.basename(f))[0]: f
        for f in find_files(args.gt_wavdir, "*.wav")
    }
    pairs = []
    for g in gen_files:
        utt = os.path.basename(g).replace("_gen.wav", "")
        if utt in gt_index:
            pairs.append((g, gt_index[utt]))
        else:
            logging.warning(f"no ground truth for {utt}; skipped.")
    assert pairs, "no (generated, ground-truth) pairs found"

    if args.n_jobs > 1:
        with mp.Pool(args.n_jobs) as pool:
            results = pool.map(_one, pairs)
    else:
        results = [_one(p) for p in pairs]

    results.sort(key=lambda r: r[0])
    mcds = np.array([m for _, m in results])
    with open(os.path.join(args.gen_wavdir, "utt2mcd"), "w") as f:
        for utt, m in results:
            f.write(f"{utt} {m:.4f}\n")
    logging.info(f"Mean MCD: {mcds.mean():.4f} +- {mcds.std():.4f}")
    print(f"Mean MCD: {mcds.mean():.4f}")


if __name__ == "__main__":
    main()
