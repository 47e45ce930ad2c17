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

from parallelwavegan_tpu.datasets import (
    AudioDataset,
    MelDataset,
    MelF0Dataset,
    MelF0ExcitationDataset,
    MelSCPDataset,
)
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
    parser.add_argument(
        "--chunk-frames", default=0, type=int,
        help="if > 0, synthesize each utterance in overlap-chunked windows "
        "of this many mel frames (memory-bounded decoding of very long "
        "utterances; exact for conv generators, see "
        "InferenceModel.inference_chunked)",
    )
    parser.add_argument("--use-f0", action="store_true")
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

    cfg = config or load_config(
        os.path.join(os.path.dirname(args.checkpoint), "config.yml")
    )
    gen_type = cfg.get("generator_type", "ParallelWaveGANGenerator")
    is_hdf5 = cfg.get("format", "hdf5") == "hdf5"
    use_f0 = args.use_f0 or gen_type == "DiscreteSymbolF0Generator" and (
        cfg.get("generator_params", {}).get("use_f0", True)
    )
    use_f0_and_excitation = gen_type == "UHiFiGANGenerator"

    if gen_type == "VQVAE":
        # wav2wav path: encode raw audio to codebook indices, then decode
        # (reference bin/decode.py:366-385)
        if is_hdf5:
            dataset = AudioDataset(
                args.dumpdir, "*.h5", lambda f: read_hdf5(f, "wave"),
                return_utt_id=True,
            )
        else:
            dataset = AudioDataset(
                args.dumpdir, "*-wave.npy", np.load, return_utt_id=True
            )
    elif args.feats_scp is not None:
        if use_f0 or use_f0_and_excitation:
            raise ValueError(
                "SCP format is not supported for f0 and excitation."
            )
        dataset = MelSCPDataset(args.feats_scp, return_utt_id=True)
    elif use_f0_and_excitation:
        dataset = (
            MelF0ExcitationDataset(args.dumpdir, return_utt_id=True)
            if is_hdf5
            else MelF0ExcitationDataset(
                args.dumpdir, mel_query="*-feats.npy", mel_load_fn=np.load,
                f0_load_fn=lambda f: np.load(
                    f.replace("-feats.npy", "-f0.npy")
                ),
                excitation_load_fn=lambda f: np.load(
                    f.replace("-feats.npy", "-excitation.npy")
                ),
                return_utt_id=True,
            )
        )
    elif use_f0:
        dataset = (
            MelF0Dataset(args.dumpdir, return_utt_id=True)
            if is_hdf5
            else MelF0Dataset(
                args.dumpdir, mel_query="*-feats.npy", mel_load_fn=np.load,
                f0_load_fn=lambda f: np.load(
                    f.replace("-feats.npy", "-f0.npy")
                ),
                return_utt_id=True,
            )
        )
    else:
        dataset = (
            MelDataset(
                args.dumpdir, "*.h5", lambda f: read_hdf5(f, "feats"),
                return_utt_id=True,
            )
            if is_hdf5
            else MelDataset(
                args.dumpdir, "*-feats.npy", np.load, return_utt_id=True
            )
        )
    logging.info(f"The number of features to be decoded = {len(dataset)}.")

    model = load_model(args.checkpoint, config, stats=args.stats)
    config = model.config
    sr = config.get("sampling_rate", 22050)

    os.makedirs(args.outdir, exist_ok=True)
    total_rtf = 0.0
    items = list(dataset)
    n_done = 0

    if gen_type == "VQVAE":
        # per-utterance encode -> decode; dump discrete symbols like the
        # reference (bin/decode.py:377-385)
        use_local = cfg.get("use_local_condition", False)
        use_global = cfg.get("use_global_condition", False)
        file_by_utt = {
            u: f for u, f in zip(dataset.utt_ids, dataset.audio_files)
        }
        symbol_lines = []
        with tqdm(total=len(items)) as pbar:
            for utt_id, audio in items:
                l = g = None
                if is_hdf5 and (use_local or use_global):
                    path = file_by_utt[utt_id]
                    if use_local:
                        l = read_hdf5(path, "local")
                    if use_global:
                        g = read_hdf5(path, "global").reshape(-1)[0]
                start = time.time()
                indices = model.vq_encode(audio)
                y = model.vq_decode(indices, l=l, g=g)
                elapsed = time.time() - start
                total_rtf += elapsed / (len(y) / sr)
                write_wav(
                    os.path.join(args.outdir, f"{utt_id}_gen.wav"),
                    y[:, 0], sr,
                )
                symbol_lines.append(
                    utt_id + " " + " ".join(map(str, indices.tolist()))
                )
                n_done += 1
                pbar.update(1)
        with open(os.path.join(args.outdir, "text"), "w") as f:
            f.write("\n".join(symbol_lines) + "\n")
    elif use_f0 or use_f0_and_excitation or "DiscreteSymbol" in gen_type:
        # exact-shape single-utterance paths
        with tqdm(total=len(items)) as pbar:
            for item in items:
                if use_f0_and_excitation:
                    utt_id, c, f0, excitation = item
                elif use_f0:
                    utt_id, c, f0 = item
                    excitation = None
                else:
                    (utt_id, c), f0, excitation = item, None, None
                start = time.time()
                w = model.inference(
                    c, normalize_before=args.normalize_before,
                    f0=f0, excitation=excitation,
                )
                elapsed = time.time() - start
                total_rtf += elapsed / (len(w) / sr)
                write_wav(
                    os.path.join(args.outdir, f"{utt_id}_gen.wav"),
                    w[:, 0], sr,
                )
                n_done += 1
                pbar.update(1)
    elif args.chunk_frames > 0:
        with tqdm(total=len(items)) as pbar:
            for utt_id, c in items:
                start = time.time()
                w = model.inference_chunked(
                    c, chunk_frames=args.chunk_frames,
                    normalize_before=args.normalize_before,
                )
                elapsed = time.time() - start
                total_rtf += elapsed / (len(w) / sr)
                write_wav(
                    os.path.join(args.outdir, f"{utt_id}_gen.wav"),
                    w[:, 0], sr,
                )
                n_done += 1
                pbar.update(1)
    else:
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
