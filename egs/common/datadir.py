#!/usr/bin/env python3
"""Kaldi-style data-directory tooling, one tool instead of the reference's
perl/shell zoo (reference utils/: validate_data_dir.sh, fix_data_dir.sh,
subset_data_dir.sh, combine_data.sh, split_data.sh, split_scp.pl,
spk2utt_to_utt2spk.pl, utt2spk_to_spk2utt.pl).

A data dir holds per-utterance key files (wav.scp, utt2spk, text,
segments, utt2dur, ...) and per-speaker files (spk2utt). Every subcommand
treats "first whitespace-separated token = key, rest = value" uniformly:

  python egs/common/datadir.py validate data/train
  python egs/common/datadir.py fix data/train
  python egs/common/datadir.py subset data/train data/train_30 --first 30
  python egs/common/datadir.py subset data/train data/dev2 --utt-list f.txt
  python egs/common/datadir.py subset data/train data/spkA --per-spk 5
  python egs/common/datadir.py combine data/all data/a data/b
  python egs/common/datadir.py split data/train 8        # -> split8/1..8
  python egs/common/datadir.py spk2utt data/train        # from utt2spk
  python egs/common/datadir.py utt2spk data/train        # from spk2utt

`fix` sorts, de-duplicates, and intersects the keys of every per-utterance
file present (the fix_data_dir.sh contract); `validate` exits non-zero
with a named complaint (validate_data_dir.sh analogue). Exercised by
tests/test_datadir.py.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List

UTT_FILES = (
    "wav.scp", "feats.scp", "utt2spk", "text", "segments", "utt2dur",
    "utt2num_frames",
)
SPK_FILES = ("spk2utt", "spk2idx")


def read_kv(path: str) -> Dict[str, str]:
    out: Dict[str, str] = {}
    with open(path) as f:
        for ln, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line.strip():
                continue
            parts = line.split(None, 1)
            if len(parts) == 1:
                raise SystemExit(
                    f"{path}:{ln}: key without value: {line!r}"
                )
            out[parts[0]] = parts[1]
    return out


def write_kv(path: str, kv: Dict[str, str]) -> None:
    with open(path, "w") as f:
        for k in sorted(kv):
            f.write(f"{k} {kv[k]}\n")


def present_utt_files(d: str) -> List[str]:
    return [f for f in UTT_FILES if os.path.exists(os.path.join(d, f))]


def cmd_validate(args) -> None:
    d = args.dir
    files = present_utt_files(d)
    if "wav.scp" not in files and "feats.scp" not in files:
        raise SystemExit(f"{d}: neither wav.scp nor feats.scp present")
    kvs = {f: read_kv(os.path.join(d, f)) for f in files}
    base_name = "wav.scp" if "wav.scp" in files else "feats.scp"
    base = set(kvs[base_name])
    for f, kv in kvs.items():
        with open(os.path.join(d, f)) as fh:
            keys = [line.split(None, 1)[0] for line in fh if line.strip()]
        if len(keys) != len(set(keys)):
            raise SystemExit(f"{d}/{f}: duplicate keys")
        if keys != sorted(keys):
            raise SystemExit(f"{d}/{f}: keys not sorted (run fix)")
        if set(kv) != base:
            missing = sorted(base - set(kv))[:5]
            extra = sorted(set(kv) - base)[:5]
            raise SystemExit(
                f"{d}/{f}: keys differ from {base_name} "
                f"(missing {missing}, extra {extra}; run fix)"
            )
    if "utt2spk" in kvs and os.path.exists(os.path.join(d, "spk2utt")):
        s2u = read_kv(os.path.join(d, "spk2utt"))
        derived = {}
        for spk, utts in s2u.items():
            for u in utts.split():
                derived[u] = spk
        if derived != kvs["utt2spk"]:
            raise SystemExit(f"{d}: spk2utt inconsistent with utt2spk")
    if "segments" in kvs:
        for u, v in kvs["segments"].items():
            parts = v.split()
            if len(parts) != 3:
                raise SystemExit(
                    f"{d}/segments: {u}: want 'rec start end', got {v!r}"
                )
            if float(parts[1]) >= float(parts[2]):
                raise SystemExit(f"{d}/segments: {u}: start >= end")
    print(f"{d}: ok ({len(base)} utterances, files: {', '.join(files)})")


def cmd_fix(args) -> None:
    d = args.dir
    files = present_utt_files(d)
    kvs = {f: read_kv(os.path.join(d, f)) for f in files}
    common = None
    for kv in kvs.values():
        common = set(kv) if common is None else common & set(kv)
    common = common or set()
    for f, kv in kvs.items():
        before = len(kv)
        write_kv(os.path.join(d, f), {k: kv[k] for k in common})
        dropped = before - len(common)
        if dropped:
            print(f"{d}/{f}: dropped {dropped} utterances")
    if "utt2spk" in kvs:
        _regen_spk2utt(d, {k: kvs["utt2spk"][k] for k in common})
    print(f"{d}: fixed ({len(common)} utterances)")


def _regen_spk2utt(d: str, utt2spk: Dict[str, str]) -> None:
    s2u: Dict[str, List[str]] = {}
    for u in sorted(utt2spk):
        s2u.setdefault(utt2spk[u], []).append(u)
    write_kv(
        os.path.join(d, "spk2utt"),
        {s: " ".join(us) for s, us in s2u.items()},
    )


def _write_subset(src: str, dst: str, keep) -> None:
    os.makedirs(dst, exist_ok=True)
    for f in present_utt_files(src):
        kv = read_kv(os.path.join(src, f))
        write_kv(os.path.join(dst, f), {k: kv[k] for k in keep if k in kv})
    u2s_path = os.path.join(dst, "utt2spk")
    if os.path.exists(u2s_path):
        _regen_spk2utt(dst, read_kv(u2s_path))
    for f in ("spk2idx",):
        if os.path.exists(os.path.join(src, f)):
            import shutil

            shutil.copy(os.path.join(src, f), os.path.join(dst, f))


def cmd_subset(args) -> None:
    base_name = "wav.scp" if os.path.exists(
        os.path.join(args.src, "wav.scp")
    ) else "feats.scp"
    base = read_kv(os.path.join(args.src, base_name))
    if args.utt_list:
        with open(args.utt_list) as f:
            keep = [line.split()[0] for line in f if line.strip()]
        unknown = sorted(set(keep) - set(base))
        if unknown:
            raise SystemExit(f"utt-list keys not in {base_name}: {unknown[:5]}")
    elif args.per_spk:
        u2s = read_kv(os.path.join(args.src, "utt2spk"))
        count: Dict[str, int] = {}
        keep = []
        for u in sorted(base):
            s = u2s[u]
            if count.get(s, 0) < args.per_spk:
                keep.append(u)
                count[s] = count.get(s, 0) + 1
    else:
        keep = sorted(base)[: args.first]
    _write_subset(args.src, args.dst, keep)
    print(f"{args.dst}: {len(keep)} utterances")


def cmd_combine(args) -> None:
    os.makedirs(args.dst, exist_ok=True)
    files = set()
    for s in args.srcs:
        files.update(present_utt_files(s))
    for f in sorted(files):
        merged: Dict[str, str] = {}
        for s in args.srcs:
            p = os.path.join(s, f)
            if not os.path.exists(p):
                raise SystemExit(
                    f"combine: {f} present in some sources but not {s}"
                )
            for k, v in read_kv(p).items():
                if k in merged and merged[k] != v:
                    raise SystemExit(f"combine: conflicting values for {k} in {f}")
                merged[k] = v
        write_kv(os.path.join(args.dst, f), merged)
    u2s_path = os.path.join(args.dst, "utt2spk")
    if os.path.exists(u2s_path):
        _regen_spk2utt(args.dst, read_kv(u2s_path))
    print(f"{args.dst}: combined {len(args.srcs)} dirs")


def cmd_split(args) -> None:
    n = args.n
    base_name = "wav.scp" if os.path.exists(
        os.path.join(args.dir, "wav.scp")
    ) else "feats.scp"
    keys = sorted(read_kv(os.path.join(args.dir, base_name)))
    for j in range(1, n + 1):
        keep = keys[j - 1 :: n]  # round-robin, matching run_stages.sh awk
        _write_subset(
            args.dir, os.path.join(args.dir, f"split{n}", str(j)), keep
        )
    print(f"{args.dir}/split{n}: {n} shards")


def cmd_spk2utt(args) -> None:
    _regen_spk2utt(args.dir, read_kv(os.path.join(args.dir, "utt2spk")))
    print(f"{args.dir}/spk2utt written")


def cmd_utt2spk(args) -> None:
    s2u = read_kv(os.path.join(args.dir, "spk2utt"))
    u2s = {}
    for s, us in s2u.items():
        for u in us.split():
            u2s[u] = s
    write_kv(os.path.join(args.dir, "utt2spk"), u2s)
    print(f"{args.dir}/utt2spk written")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("validate")
    sp.add_argument("dir")
    sp.set_defaults(fn=cmd_validate)

    sp = sub.add_parser("fix")
    sp.add_argument("dir")
    sp.set_defaults(fn=cmd_fix)

    sp = sub.add_parser("subset")
    sp.add_argument("src")
    sp.add_argument("dst")
    g = sp.add_mutually_exclusive_group(required=True)
    g.add_argument("--first", type=int)
    g.add_argument("--utt-list")
    g.add_argument("--per-spk", type=int)
    sp.set_defaults(fn=cmd_subset)

    sp = sub.add_parser("combine")
    sp.add_argument("dst")
    sp.add_argument("srcs", nargs="+")
    sp.set_defaults(fn=cmd_combine)

    sp = sub.add_parser("split")
    sp.add_argument("dir")
    sp.add_argument("n", type=int)
    sp.set_defaults(fn=cmd_split)

    sp = sub.add_parser("spk2utt")
    sp.add_argument("dir")
    sp.set_defaults(fn=cmd_spk2utt)

    sp = sub.add_parser("utt2spk")
    sp.add_argument("dir")
    sp.set_defaults(fn=cmd_utt2spk)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
