#!/usr/bin/env python3
"""Synthesize waveforms directly from discrete-token text (behavioral
parity: /root/reference/egs/cvss_c/hubert_voc1/local/decode_from_text.py,
promoted to a first-class CLI).

Input: a Kaldi-style text file `<utt_id> <tok> <tok> ...`; each line is fed
to a DiscreteSymbol* generator (duration variants expand tokens with
predicted durations)."""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np
from tqdm import tqdm

from parallelwavegan_tpu.utils.io import load_config, write_wav
from parallelwavegan_tpu.utils.model_loader import load_model


def main():
    parser = argparse.ArgumentParser(
        description="Decode discrete token sequences into waveforms."
    )
    parser.add_argument("--text", type=str, required=True)
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--config", default=None, type=str)
    parser.add_argument(
        "--spk-idx", default=None, type=int,
        help="speaker index appended as the second token column "
        "(models with num_spk_embs > 0)",
    )
    parser.add_argument(
        "--unique", action="store_true",
        help="collapse consecutive repeated tokens before synthesis "
        "(duration models predict the expansion back)",
    )
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    config = load_config(args.config) if args.config else None
    model = load_model(args.checkpoint, config)
    config = model.config
    gen_type = config.get("generator_type", "")
    assert "DiscreteSymbol" in gen_type, (
        f"decode_from_text requires a DiscreteSymbol* generator, "
        f"got {gen_type}"
    )
    sr = config.get("sampling_rate", 16000)

    with open(args.text) as f:
        lines = [line.strip() for line in f if line.strip()]
    os.makedirs(args.outdir, exist_ok=True)

    total_rtf, n_done = 0.0, 0
    for line in tqdm(lines):
        utt_id, toks = line.split(maxsplit=1)
        c = np.asarray(toks.split(), dtype=np.int64)
        if args.unique:
            keep = np.concatenate([[True], c[1:] != c[:-1]])
            c = c[keep]
        c = c[:, None]
        if args.spk_idx is not None:
            c = np.concatenate(
                [c, np.full_like(c, args.spk_idx)], axis=1
            )
        start = time.time()
        y = model.inference(c.astype(np.float32))
        elapsed = time.time() - start
        total_rtf += elapsed / (len(y) / sr)
        write_wav(os.path.join(args.outdir, f"{utt_id}_gen.wav"), y[:, 0], sr)
        n_done += 1

    logging.info(
        f"Finished generation of {n_done} utterances "
        f"(RTF = {total_rtf / max(n_done, 1):.06f})."
    )


if __name__ == "__main__":
    main()
