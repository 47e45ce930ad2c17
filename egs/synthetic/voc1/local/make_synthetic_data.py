#!/usr/bin/env python3
"""Generate a synthetic corpus for the offline integration recipe.

Two modes:
  default      — tiny sine corpus (fast debug runs, CI)
  --rich       — speech-like corpus for quality-at-scale training runs:
                 glottal-pulse-style harmonic stacks under f0 contours
                 (glides + vibrato), formant-like resonances, alternating
                 voiced/unvoiced (filtered-noise) segments, energy
                 envelopes. Deterministic per utterance index.

The rich mode is the offline stand-in for LJSpeech-scale corpora (no
egress in this environment); it exercises the same preprocessing, GAN
training dynamics (harmonic + noise bands, V/UV transitions), and the
MCD/log-F0 eval harness.
"""

import argparse
import os
import zlib

import numpy as np
import yaml

from parallelwavegan_tpu.utils.io import write_wav


def _smooth_noise(rng, n, smooth):
    """Low-pass random walk in [0, 1] via cumulative smoothing."""
    x = rng.standard_normal(max(2, n // smooth) + 2)
    t = np.linspace(0, len(x) - 1.001, n)
    i = t.astype(int)
    frac = t - i
    y = x[i] * (1 - frac) + x[i + 1] * frac
    y = (y - y.min()) / max(np.ptp(y), 1e-9)
    return y


def _formant_filter(wave, sr, centers, bws, rng):
    """Cascade of 2nd-order resonators (formant-like spectral envelope)."""
    from scipy.signal import lfilter

    y = wave
    for fc, bw in zip(centers, bws):
        r = np.exp(-np.pi * bw / sr)
        theta = 2 * np.pi * fc / sr
        a = [1.0, -2 * r * np.cos(theta), r * r]
        b0 = (1 - r) * np.sqrt(1 - 2 * r * np.cos(2 * theta) + r * r)
        y = lfilter([b0], a, y)
    return y


def make_rich_utt(rng, sr, dur):
    n = int(sr * dur)
    t = np.arange(n) / sr
    # f0 contour: base glide + vibrato, 90-350 Hz
    f_lo, f_hi = 90.0, 350.0
    contour = _smooth_noise(rng, n, sr // 4)
    f0 = f_lo + (f_hi - f_lo) * (0.15 + 0.7 * contour)
    f0 *= 1 + 0.02 * np.sin(2 * np.pi * (4.5 + rng.uniform(0, 2)) * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    # harmonic stack with random tilt (glottal-ish source)
    tilt = rng.uniform(0.6, 0.95)
    voiced_src = sum(
        (tilt ** (h - 1)) * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
        for h in range(1, 12)
    )
    # voiced/unvoiced segmentation (speech-like alternation)
    seg = _smooth_noise(rng, n, sr // 6)
    voiced_mask = (seg > 0.3).astype(np.float64)
    # smooth the mask edges (~5 ms) to avoid clicks
    k = max(1, sr // 200)
    voiced_mask = np.convolve(voiced_mask, np.ones(k) / k, mode="same")
    noise_src = rng.standard_normal(n)
    src = voiced_src * voiced_mask + 0.25 * noise_src * (1 - voiced_mask)
    src += 0.02 * noise_src  # breathiness
    # formant-like resonances (random per utt)
    centers = sorted(rng.uniform([300, 900, 1900], [800, 1800, 3000]))
    bws = rng.uniform([80, 90, 120], [120, 160, 220])
    y = _formant_filter(src, sr, centers, bws, rng)
    # energy envelope
    env = 0.25 + 0.75 * _smooth_noise(rng, n, sr // 3)
    y *= env
    y = 0.6 * y / max(np.abs(y).max(), 1e-9)
    return y.astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--n-utts", type=int, default=12)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--rich", action="store_true")
    parser.add_argument("--dur", type=float, default=None,
                        help="utterance duration (rich mode; default 3-4 s)")
    parser.add_argument(
        "--splits", type=str, default="train,dev,eval",
        help="comma-separated subset of splits to generate",
    )
    parser.add_argument(
        "--start-index", type=int, default=0,
        help="first utterance index (extend an existing split in place "
        "without touching already-generated utterances; wav.scp is "
        "appended to when > 0)",
    )
    args = parser.parse_args()

    with open(args.config) as f:
        config = yaml.safe_load(f)
    sr = config["sampling_rate"]

    n_eval = max(4, args.n_utts // 10)
    splits = {
        "train": range(args.start_index, args.n_utts),
        "dev": range(args.start_index, n_eval),
        "eval": range(args.start_index, n_eval),
    }
    splits = {
        k: v for k, v in splits.items() if k in args.splits.split(",")
    }
    for split, idxs in splits.items():
        outdir = os.path.join(args.outdir, split)
        os.makedirs(outdir, exist_ok=True)
        # extension runs append to wav.scp; never write an id twice (a
        # repeated run with the same --start-index must be a no-op)
        scp_path = os.path.join(outdir, "wav.scp")
        existing = set()
        if args.start_index > 0 and os.path.exists(scp_path):
            with open(scp_path) as fh:
                existing = {ln.split()[0] for ln in fh if ln.strip()}
        scp = []
        for i in idxs:
            if f"{split}_utt{i}" in existing:
                continue
            # crc32, NOT hash(): Python string hashing is salted per
            # process, which silently made "deterministic per utterance"
            # false across invocations
            rng = np.random.default_rng(
                zlib.crc32(f"{split}_{i}".encode()) if args.rich else 0
            )
            if args.rich:
                dur = args.dur or (3.0 + (i % 5) * 0.25)
                wave = make_rich_utt(rng, sr, dur)
            else:
                rng = np.random.default_rng(0)
                dur = 1.0 + 0.25 * (i % 3)
                t = np.arange(int(sr * dur))
                f = 110.0 * (1 + (i % 5))
                wave = 0.4 * np.sin(2 * np.pi * f * t / sr)
                wave += 0.1 * np.sin(2 * np.pi * 2 * f * t / sr)
                wave *= 0.5 * (1 - np.cos(2 * np.pi * t / len(t)))
                wave += 0.01 * rng.standard_normal(len(t))
                wave = wave.astype(np.float32)
            path = os.path.join(outdir, f"{split}_utt{i}.wav")
            write_wav(path, wave, sr)
            scp.append(f"{split}_utt{i} {os.path.abspath(path)}")
        mode = "a" if args.start_index > 0 else "w"
        if scp:
            with open(scp_path, mode) as fh:
                fh.write("\n".join(scp) + "\n")
    print(f"Generated corpus under {args.outdir}")


if __name__ == "__main__":
    main()
