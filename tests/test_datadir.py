"""Kaldi data-dir tooling (egs/common/datadir.py — the analogue of the
reference's utils/{validate,fix,subset,combine,split}_data_dir and the
spk2utt/utt2spk converters)."""

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "egs", "common"),
)
import datadir  # noqa: E402


def _mkdata(d, utts, spks=None, text=False, segments=False):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "wav.scp"), "w") as f:
        for u in utts:
            f.write(f"{u} /wavs/{u}.wav\n")
    if spks:
        with open(os.path.join(d, "utt2spk"), "w") as f:
            for u, s in zip(utts, spks):
                f.write(f"{u} {s}\n")
        datadir.cmd_spk2utt(type("A", (), {"dir": str(d)}))
    if text:
        with open(os.path.join(d, "text"), "w") as f:
            for u in utts:
                f.write(f"{u} 1 2 3\n")
    if segments:
        with open(os.path.join(d, "segments"), "w") as f:
            for u in utts:
                f.write(f"{u} rec1 0.0 1.0\n")


def test_validate_ok_and_failures(tmp_path):
    d = str(tmp_path / "ok")
    _mkdata(d, ["a", "b", "c"], spks=["s1", "s1", "s2"], text=True,
            segments=True)
    datadir.main(["validate", d])

    # key mismatch across files
    with open(os.path.join(d, "text"), "a") as f:
        f.write("zz 9\n")
    with pytest.raises(SystemExit, match="keys differ"):
        datadir.main(["validate", d])

    # fix repairs it (drops the orphan key everywhere)
    datadir.main(["fix", d])
    datadir.main(["validate", d])

    bad = str(tmp_path / "badseg")
    _mkdata(bad, ["a"], segments=False)
    with open(os.path.join(bad, "segments"), "w") as f:
        f.write("a rec1 2.0 1.0\n")
    with pytest.raises(SystemExit, match="start >= end"):
        datadir.main(["validate", bad])


def test_fix_intersects_and_sorts(tmp_path):
    d = str(tmp_path / "d")
    os.makedirs(d)
    with open(os.path.join(d, "wav.scp"), "w") as f:
        f.write("b /b.wav\na /a.wav\nc /c.wav\n")  # unsorted
    with open(os.path.join(d, "utt2spk"), "w") as f:
        f.write("a s1\nb s2\n")  # missing c
    datadir.main(["fix", d])
    assert open(os.path.join(d, "wav.scp")).read() == (
        "a /a.wav\nb /b.wav\n"
    )
    assert open(os.path.join(d, "spk2utt")).read() == "s1 a\ns2 b\n"
    datadir.main(["validate", d])


def test_subset_modes(tmp_path):
    src = str(tmp_path / "src")
    utts = [f"u{i:02d}" for i in range(10)]
    spks = ["s1" if i < 6 else "s2" for i in range(10)]
    _mkdata(src, utts, spks=spks, text=True)

    d1 = str(tmp_path / "first3")
    datadir.main(["subset", src, d1, "--first", "3"])
    assert open(os.path.join(d1, "wav.scp")).read().count("\n") == 3
    datadir.main(["validate", d1])

    lst = str(tmp_path / "list.txt")
    with open(lst, "w") as f:
        f.write("u03\nu07\n")
    d2 = str(tmp_path / "bylist")
    datadir.main(["subset", src, d2, "--utt-list", lst])
    assert [l.split()[0] for l in open(os.path.join(d2, "wav.scp"))] == [
        "u03", "u07",
    ]

    d3 = str(tmp_path / "perspk")
    datadir.main(["subset", src, d3, "--per-spk", "2"])
    u2s = datadir.read_kv(os.path.join(d3, "utt2spk"))
    assert sorted(u2s) == ["u00", "u01", "u06", "u07"]

    with pytest.raises(SystemExit, match="not in wav.scp"):
        with open(lst, "w") as f:
            f.write("nope\n")
        datadir.main(["subset", src, str(tmp_path / "x"), "--utt-list", lst])


def test_combine_and_conflicts(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _mkdata(a, ["a1", "a2"], spks=["s1", "s1"])
    _mkdata(b, ["b1"], spks=["s2"])
    dst = str(tmp_path / "all")
    datadir.main(["combine", dst, a, b])
    assert [l.split()[0] for l in open(os.path.join(dst, "wav.scp"))] == [
        "a1", "a2", "b1",
    ]
    datadir.main(["validate", dst])

    # conflicting duplicate key -> error
    c = str(tmp_path / "c")
    _mkdata(c, ["a1"], spks=["s9"])
    with open(os.path.join(c, "wav.scp"), "w") as f:
        f.write("a1 /different.wav\n")
    with pytest.raises(SystemExit, match="conflicting"):
        datadir.main(["combine", str(tmp_path / "bad"), a, c])


def test_split_round_robin(tmp_path):
    d = str(tmp_path / "d")
    utts = [f"u{i}" for i in range(7)]
    _mkdata(d, utts)
    datadir.main(["split", d, "3"])
    shards = [
        [l.split()[0] for l in open(os.path.join(d, "split3", str(j), "wav.scp"))]
        for j in (1, 2, 3)
    ]
    assert sorted(sum(shards, [])) == sorted(utts)
    assert abs(len(shards[0]) - len(shards[2])) <= 1


def test_spk2utt_utt2spk_roundtrip(tmp_path):
    d = str(tmp_path / "d")
    _mkdata(d, ["a", "b", "c"], spks=["s2", "s1", "s2"])
    u2s_orig = open(os.path.join(d, "utt2spk")).read()
    os.remove(os.path.join(d, "utt2spk"))
    datadir.main(["utt2spk", d])
    assert open(os.path.join(d, "utt2spk")).read() == (
        "".join(sorted(u2s_orig.splitlines(keepends=True)))
    )
