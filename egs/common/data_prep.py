#!/usr/bin/env python3
"""Shared Kaldi-style data preparation for all corpora recipes.

Scans wavs with a glob pattern, optionally derives a speaker id from each
path with a regex, and writes per-split wav.scp (+ utt2spk, spk2idx for
multi-speaker corpora). The split is deterministic: for single-speaker
corpora the tail of the sorted list goes to dev/eval (reference
egs/ljspeech/voc1/run.sh split); for multi-speaker corpora the *per-speaker*
tail goes to dev/eval so all speakers appear in every split (reference
egs/vctk/voc1/run.sh split shape).
"""

import argparse
import glob
import os
import re
from collections import defaultdict


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--db-root", type=str, required=True)
    parser.add_argument(
        "--wav-glob", type=str, required=True,
        help="glob under db-root, e.g. 'wavs/*.wav' or 'wav48/*/*.wav'",
    )
    parser.add_argument("--outdir", type=str, default="data")
    parser.add_argument(
        "--spk-regex", type=str, default=None,
        help="regex over the path whose group(1) is the speaker id; "
        "enables multi-speaker mode (utt2spk + spk2idx)",
    )
    parser.add_argument("--num-dev", type=int, default=250)
    parser.add_argument("--num-eval", type=int, default=250)
    parser.add_argument(
        "--spks", type=str, default=None,
        help="optional space-separated speaker allowlist",
    )
    args = parser.parse_args()

    wavs = sorted(
        glob.glob(os.path.join(args.db_root, args.wav_glob), recursive=True)
    )
    assert wavs, f"no wavs match {args.wav_glob} under {args.db_root}"

    def utt_id(path):
        return os.path.splitext(os.path.basename(path))[0]

    if args.spk_regex is None:
        by_spk = {None: wavs}
    else:
        by_spk = defaultdict(list)
        for w in wavs:
            m = re.search(args.spk_regex, w)
            assert m, f"--spk-regex does not match {w}"
            by_spk[m.group(1)].append(w)
        if args.spks:
            keep = set(args.spks.split())
            by_spk = {s: v for s, v in by_spk.items() if s in keep}
            assert by_spk, "no speakers left after --spks filtering"

    n_spk = len(by_spk)
    # per-speaker dev/eval sizes (ceil-free: at least 1 when corpus allows)
    n_dev = max(args.num_dev // n_spk, 1)
    n_eval = max(args.num_eval // n_spk, 1)
    splits = {"train": [], "dev": [], "eval": []}
    for spk in sorted(by_spk, key=str):
        files = by_spk[spk]
        assert len(files) > n_dev + n_eval, (
            f"speaker {spk}: corpus too small for the requested split"
        )
        splits["train"] += [(u, spk) for u in files[: -n_dev - n_eval]]
        splits["dev"] += [(u, spk) for u in files[-n_dev - n_eval : -n_eval]]
        splits["eval"] += [(u, spk) for u in files[-n_eval:]]

    spk2idx = {
        s: i for i, s in enumerate(sorted(k for k in by_spk if k is not None))
    }
    for split, items in splits.items():
        outdir = os.path.join(args.outdir, split)
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "wav.scp"), "w") as f:
            for w, _ in sorted(items, key=lambda t: utt_id(t[0])):
                f.write(f"{utt_id(w)} {os.path.abspath(w)}\n")
        if args.spk_regex is not None:
            with open(os.path.join(outdir, "utt2spk"), "w") as f:
                for w, spk in sorted(items, key=lambda t: utt_id(t[0])):
                    f.write(f"{utt_id(w)} {spk}\n")
            with open(os.path.join(outdir, "spk2idx"), "w") as f:
                for s, i in spk2idx.items():
                    f.write(f"{s} {i}\n")
        print(f"{split}: {len(items)} utterances")


if __name__ == "__main__":
    main()
