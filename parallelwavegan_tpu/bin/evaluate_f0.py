#!/usr/bin/env python3
"""Evaluate log-F0 RMSE / V-UV error / semitone accuracy between generated
and ground-truth wavs (behavioral parity:
/root/reference/parallel_wavegan/bin/evaluate_f0.py and
utils/evaluate_semitone.py, utils/evaluate_vuv.py)."""

from __future__ import annotations

import argparse
import logging
import multiprocessing as mp
import os

import numpy as np

from parallelwavegan_tpu.ops.eval_metrics import log_f0_rmse, semitone_accuracy
from parallelwavegan_tpu.utils.io import find_files, read_wav


def _one(pair):
    gen_path, gt_path = pair
    gen, fs = read_wav(gen_path)
    gt, _ = read_wav(gt_path)
    utt_id = os.path.basename(gen_path).replace("_gen.wav", "")
    rmse, vuv = log_f0_rmse(gen, gt, fs)
    semitone = semitone_accuracy(gen, gt, fs)
    return utt_id, rmse, vuv, semitone


def main():
    parser = argparse.ArgumentParser(description="Evaluate log-F0 RMSE.")
    parser.add_argument("--outdir", "--wavdir", dest="gen_wavdir", type=str,
                        required=True)
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
    pairs = [
        (g, gt_index[os.path.basename(g).replace("_gen.wav", "")])
        for g in gen_files
        if os.path.basename(g).replace("_gen.wav", "") in gt_index
    ]
    assert pairs, "no (generated, ground-truth) pairs found"

    if args.n_jobs > 1:
        with mp.Pool(args.n_jobs) as pool:
            results = pool.map(_one, pairs)
    else:
        results = [_one(p) for p in pairs]

    results.sort(key=lambda r: r[0])
    with open(os.path.join(args.gen_wavdir, "utt2logf0rmse"), "w") as f:
        for utt, rmse, vuv, semi in results:
            f.write(f"{utt} {rmse:.4f} {vuv:.4f} {semi:.4f}\n")
    rmses = np.array([r for _, r, _, _ in results])
    vuvs = np.array([v for _, _, v, _ in results])
    # an utterance pair with no commonly-voiced frames has no defined RMSE
    # (rmse = nan per utt); report n/a rather than nan when none has one
    valid = rmses[~np.isnan(rmses)]
    mean_rmse = f"{valid.mean():.4f}" if valid.size else "n/a (no voiced overlap)"
    logging.info(
        f"Mean log-F0 RMSE: {mean_rmse}; V/UV error: {vuvs.mean():.4f}"
    )
    print(f"Mean log-F0 RMSE: {mean_rmse}")


if __name__ == "__main__":
    main()
