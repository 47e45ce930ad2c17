"""Native C++ data loader: build, crop semantics, sharding, noise input."""

import numpy as np
import pytest

from parallelwavegan_tpu.datasets import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.is_available(),
    reason="native loader could not be built",
)


@pytest.fixture
def npy_corpus(tmp_path):
    rng = np.random.default_rng(0)
    hop, mel_dim = 64, 10
    pairs = []
    for i in range(6):
        frames = 40 + 8 * i
        feats = rng.standard_normal((frames, mel_dim)).astype(np.float32)
        wave = rng.standard_normal(frames * hop).astype(np.float32)
        wp = tmp_path / f"utt{i}-wave.npy"
        fp = tmp_path / f"utt{i}-feats.npy"
        np.save(wp, wave)
        np.save(fp, feats)
        pairs.append((str(wp), str(fp)))
    return pairs, hop, mel_dim


def test_native_loader_batches(npy_corpus):
    pairs, hop, mel_dim = npy_corpus
    ctx = 2
    steps = 16 * hop
    loader = native_loader.NativeMelWavLoader(
        pairs, batch_size=3, batch_max_steps=steps, hop_size=hop,
        aux_context_window=ctx, use_noise_input=True, seed=7,
    )
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    for b in batches:
        assert b["y"].shape == (3, steps, 1)
        assert b["c"].shape == (3, 16 + 2 * ctx, mel_dim)
        assert b["z"].shape == (3, steps, 1)
        assert np.isfinite(b["y"]).all() and np.isfinite(b["c"]).all()
        # z is ~N(0,1), not zero-filled
        assert 0.5 < b["z"].std() < 1.5

    # windows must be genuine slices of the dumps: match y against the utts
    y0 = batches[0]["y"][0, :, 0]
    found = False
    for wp, _ in pairs:
        wave = np.load(wp)
        if len(wave) < steps:
            continue
        # search for the window start by matching the first 8 samples
        w = np.lib.stride_tricks.sliding_window_view(wave, 8)
        hits = np.where((w == y0[:8]).all(axis=1))[0]
        for h in hits:
            if h + steps <= len(wave) and np.array_equal(
                wave[h : h + steps], y0
            ):
                assert h % hop == 0  # crop starts on a frame boundary
                found = True
    assert found


def test_native_loader_epoch_reshuffle_and_shards(npy_corpus):
    pairs, hop, _ = npy_corpus
    mk = lambda shard, shards: native_loader.NativeMelWavLoader(
        pairs, batch_size=2, batch_max_steps=16 * hop, hop_size=hop,
        seed=3, num_shards=shards, shard_index=shard,
    )
    a = mk(0, 2)
    b = mk(1, 2)
    ya = np.concatenate([x["y"] for x in a])
    yb = np.concatenate([x["y"] for x in b])
    # different shards see different data
    assert not np.array_equal(ya, yb)
    # epochs reshuffle deterministically
    a.set_epoch(0)
    ya0 = np.concatenate([x["y"] for x in a])
    a.set_epoch(1)
    ya1 = np.concatenate([x["y"] for x in a])
    a.set_epoch(0)
    ya0b = np.concatenate([x["y"] for x in a])
    assert np.array_equal(ya0, ya0b)
    assert not np.array_equal(ya0, ya1)


def test_native_loader_filters_short_utts(tmp_path):
    rng = np.random.default_rng(0)
    hop = 64
    wp, fp = str(tmp_path / "w.npy"), str(tmp_path / "f.npy")
    np.save(wp, rng.standard_normal(6 * hop).astype(np.float32))
    np.save(fp, rng.standard_normal((6, 4)).astype(np.float32))
    with pytest.raises(RuntimeError):
        native_loader.NativeMelWavLoader(
            [(wp, fp)], batch_size=1, batch_max_steps=16 * hop, hop_size=hop,
        )


def test_train_cli_picks_native_loader(npy_corpus, tmp_path, monkeypatch):
    """bin.train.build_loader auto-selects the C++ loader for npy dumps."""
    import shutil

    from parallelwavegan_tpu.bin.train import build_dataset, build_loader

    pairs, hop, mel_dim = npy_corpus
    dumpdir = tmp_path / "dump"
    dumpdir.mkdir()
    for wp, fp in pairs:
        shutil.copy(wp, dumpdir)
        shutil.copy(fp, dumpdir)
    config = {
        "format": "npy",
        "hop_size": hop,
        "batch_size": 2,
        "batch_max_steps": 16 * hop,
        "generator_type": "ParallelWaveGANGenerator",
        "generator_params": {"aux_context_window": 2},
    }
    dataset = build_dataset(config, str(dumpdir))
    loader = build_loader(config, dataset, seed=0, num_shards=1, shard_index=0)
    assert isinstance(loader, native_loader.NativeMelWavLoader)
    batch = next(iter(loader))
    assert set(batch) == {"y", "c", "z"}
    assert batch["c"].shape == (2, 16 + 4, mel_dim)
