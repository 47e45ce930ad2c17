"""Directory-scan datasets over dumped wave/mel (+f0/excitation/local/global)
features (behavioral parity:
/root/reference/parallel_wavegan/datasets/audio_mel_dataset.py:18-1009).

Plain-python sequence datasets (numpy in/out). Length filtering happens at
init (loading each file once, like the reference); an optional in-memory
cache avoids re-reading hdf5 in the hot loop.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, List, Optional

import numpy as np

from parallelwavegan_tpu.utils.io import find_files, read_hdf5


def _default_loaders(fmt: str):
    if fmt == "hdf5":
        return (
            "*.h5",
            "*.h5",
            lambda f: read_hdf5(f, "wave"),
            lambda f: read_hdf5(f, "feats"),
        )
    if fmt == "npy":
        return ("*-wave.npy", "*-feats.npy", np.load, np.load)
    raise ValueError(f"format {fmt} is not supported.")


def _utt_id(path: str) -> str:
    """Basename sans extension and the npy modality suffix
    (utt0-wave.npy / utt0-feats.npy -> utt0)."""
    base = os.path.splitext(os.path.basename(path))[0]
    for suf in ("-wave", "-feats"):
        if base.endswith(suf):
            return base[: -len(suf)]
    return base


class _CachedDataset:
    """Shared caching / len / getitem plumbing."""

    def __init__(self, utt_ids, allow_cache):
        self.utt_ids = utt_ids
        self.allow_cache = allow_cache
        if allow_cache:
            # The reference caches via multiprocessing.Manager because torch
            # DataLoader workers are separate processes
            # (/root/reference/parallel_wavegan/datasets/audio_mel_dataset.py:64-68).
            # Our loader prefetches with THREADS (datasets/loader.py), so a
            # plain list is correct (item assignment is GIL-atomic) and much
            # faster (no IPC pickling per item). It also avoids forking a
            # Manager server after JAX starts its runtime threads, which can
            # deadlock the forked child on an inherited lock.
            self.caches = [() for _ in range(len(utt_ids))]

    def __len__(self):
        return len(self.utt_ids)

    def _cached(self, idx, load_fn):
        if self.allow_cache and len(self.caches[idx]) != 0:
            return self.caches[idx]
        items = load_fn(idx)
        if self.allow_cache:
            self.caches[idx] = items
        return items


class AudioMelDataset(_CachedDataset):
    """Paired (audio, mel) dataset with length-threshold filtering."""

    def __init__(
        self,
        root_dir: str,
        audio_query: str = "*.h5",
        mel_query: str = "*.h5",
        audio_load_fn: Callable = lambda f: read_hdf5(f, "wave"),
        mel_load_fn: Callable = lambda f: read_hdf5(f, "feats"),
        audio_length_threshold: Optional[int] = None,
        mel_length_threshold: Optional[int] = None,
        return_utt_id: bool = False,
        allow_cache: bool = False,
    ):
        audio_files = find_files(root_dir, audio_query)
        mel_files = find_files(root_dir, mel_query)
        if audio_length_threshold is not None:
            lengths = [audio_load_fn(f).shape[0] for f in audio_files]
            idxs = [i for i in range(len(audio_files))
                    if lengths[i] > audio_length_threshold]
            if len(idxs) != len(audio_files):
                logging.warning(
                    "Some files are filtered by audio length threshold "
                    f"({len(audio_files)} -> {len(idxs)})."
                )
            audio_files = [audio_files[i] for i in idxs]
            mel_files = [mel_files[i] for i in idxs]
        if mel_length_threshold is not None:
            lengths = [mel_load_fn(f).shape[0] for f in mel_files]
            idxs = [i for i in range(len(mel_files))
                    if lengths[i] > mel_length_threshold]
            if len(idxs) != len(mel_files):
                logging.warning(
                    "Some files are filtered by mel length threshold "
                    f"({len(mel_files)} -> {len(idxs)})."
                )
            audio_files = [audio_files[i] for i in idxs]
            mel_files = [mel_files[i] for i in idxs]
        assert len(audio_files) != 0, f"No audio files in {root_dir}."
        assert len(audio_files) == len(mel_files), (
            f"#audio != #mel files ({len(audio_files)} vs {len(mel_files)})."
        )
        self.audio_files = audio_files
        self.mel_files = mel_files
        self.audio_load_fn = audio_load_fn
        self.mel_load_fn = mel_load_fn
        self.return_utt_id = return_utt_id
        utt_ids = [_utt_id(f) for f in audio_files]
        super().__init__(utt_ids, allow_cache)

    def __getitem__(self, idx):
        def load(i):
            audio = self.audio_load_fn(self.audio_files[i])
            mel = self.mel_load_fn(self.mel_files[i])
            if self.return_utt_id:
                return (self.utt_ids[i], audio, mel)
            return (audio, mel)

        return self._cached(idx, load)


class AudioMelF0Dataset(AudioMelDataset):
    """+ per-frame f0."""

    def __init__(self, root_dir, f0_query: str = "*.h5",
                 f0_load_fn: Callable = lambda f: read_hdf5(f, "f0"), **kwargs):
        super().__init__(root_dir, **kwargs)
        self.f0_files = find_files(root_dir, f0_query)
        self.f0_load_fn = f0_load_fn

    def __getitem__(self, idx):
        def load(i):
            audio = self.audio_load_fn(self.audio_files[i])
            mel = self.mel_load_fn(self.mel_files[i])
            f0 = self.f0_load_fn(self.audio_files[i])
            if self.return_utt_id:
                return (self.utt_ids[i], audio, mel, f0)
            return (audio, mel, f0)

        return self._cached(idx, load)


class AudioMelF0ExcitationDataset(AudioMelDataset):
    """+ f0 and excitation."""

    def __init__(
        self, root_dir,
        f0_load_fn: Callable = lambda f: read_hdf5(f, "f0"),
        excitation_load_fn: Callable = lambda f: read_hdf5(f, "excitation"),
        **kwargs,
    ):
        super().__init__(root_dir, **kwargs)
        self.f0_load_fn = f0_load_fn
        self.excitation_load_fn = excitation_load_fn

    def __getitem__(self, idx):
        def load(i):
            audio = self.audio_load_fn(self.audio_files[i])
            mel = self.mel_load_fn(self.mel_files[i])
            f0 = self.f0_load_fn(self.audio_files[i])
            excitation = self.excitation_load_fn(self.audio_files[i])
            if self.return_utt_id:
                return (self.utt_ids[i], audio, mel, f0, excitation)
            return (audio, mel, f0, excitation)

        return self._cached(idx, load)


class AudioDataset(_CachedDataset):
    """Audio-only dataset (used by preprocess/statistics)."""

    def __init__(
        self,
        root_dir: str,
        audio_query: str = "*.h5",
        audio_load_fn: Callable = lambda f: read_hdf5(f, "wave"),
        audio_length_threshold: Optional[int] = None,
        return_utt_id: bool = False,
        allow_cache: bool = False,
    ):
        audio_files = find_files(root_dir, audio_query)
        if audio_length_threshold is not None:
            lengths = [audio_load_fn(f).shape[0] for f in audio_files]
            idxs = [i for i in range(len(audio_files))
                    if lengths[i] > audio_length_threshold]
            audio_files = [audio_files[i] for i in idxs]
        assert len(audio_files) != 0, f"No audio files in {root_dir}."
        self.audio_files = audio_files
        self.audio_load_fn = audio_load_fn
        self.return_utt_id = return_utt_id
        utt_ids = [_utt_id(f) for f in audio_files]
        super().__init__(utt_ids, allow_cache)

    def __getitem__(self, idx):
        def load(i):
            audio = self.audio_load_fn(self.audio_files[i])
            if self.return_utt_id:
                return (self.utt_ids[i], audio)
            return audio

        return self._cached(idx, load)


class MelDataset(_CachedDataset):
    """Mel-only dataset (used by decode / statistics)."""

    def __init__(
        self,
        root_dir: str,
        mel_query: str = "*.h5",
        mel_load_fn: Callable = lambda f: read_hdf5(f, "feats"),
        mel_length_threshold: Optional[int] = None,
        return_utt_id: bool = False,
        allow_cache: bool = False,
    ):
        mel_files = find_files(root_dir, mel_query)
        if mel_length_threshold is not None:
            lengths = [mel_load_fn(f).shape[0] for f in mel_files]
            idxs = [i for i in range(len(mel_files))
                    if lengths[i] > mel_length_threshold]
            mel_files = [mel_files[i] for i in idxs]
        assert len(mel_files) != 0, f"No mel files in {root_dir}."
        self.mel_files = mel_files
        self.mel_load_fn = mel_load_fn
        self.return_utt_id = return_utt_id
        utt_ids = [_utt_id(f) for f in mel_files]
        super().__init__(utt_ids, allow_cache)

    def __getitem__(self, idx):
        def load(i):
            mel = self.mel_load_fn(self.mel_files[i])
            if self.return_utt_id:
                return (self.utt_ids[i], mel)
            return mel

        return self._cached(idx, load)


class MelF0Dataset(MelDataset):
    def __init__(self, root_dir,
                 f0_load_fn: Callable = lambda f: read_hdf5(f, "f0"), **kwargs):
        super().__init__(root_dir, **kwargs)
        self.f0_load_fn = f0_load_fn

    def __getitem__(self, idx):
        def load(i):
            mel = self.mel_load_fn(self.mel_files[i])
            f0 = self.f0_load_fn(self.mel_files[i])
            if self.return_utt_id:
                return (self.utt_ids[i], mel, f0)
            return (mel, f0)

        return self._cached(idx, load)


class MelF0ExcitationDataset(MelDataset):
    def __init__(
        self, root_dir,
        f0_load_fn: Callable = lambda f: read_hdf5(f, "f0"),
        excitation_load_fn: Callable = lambda f: read_hdf5(f, "excitation"),
        **kwargs,
    ):
        super().__init__(root_dir, **kwargs)
        self.f0_load_fn = f0_load_fn
        self.excitation_load_fn = excitation_load_fn

    def __getitem__(self, idx):
        def load(i):
            mel = self.mel_load_fn(self.mel_files[i])
            f0 = self.f0_load_fn(self.mel_files[i])
            excitation = self.excitation_load_fn(self.mel_files[i])
            if self.return_utt_id:
                return (self.utt_ids[i], mel, f0, excitation)
            return (mel, f0, excitation)

        return self._cached(idx, load)


class AudioGlobalDataset(AudioDataset):
    """(audio, global speaker index) pairs for globally-conditioned VQVAE
    training (reference datasets/audio_mel_dataset.py audio+global variants;
    the 'global' key is written by bin/preprocess.py --utt2spk/--spk2idx)."""

    def __init__(
        self, root_dir,
        global_load_fn: Callable = lambda f: read_hdf5(f, "global"),
        **kwargs,
    ):
        super().__init__(root_dir, **kwargs)
        self.global_load_fn = global_load_fn

    def __getitem__(self, idx):
        def load(i):
            audio = self.audio_load_fn(self.audio_files[i])
            g = int(np.asarray(self.global_load_fn(self.audio_files[i])).reshape(-1)[0])
            if self.return_utt_id:
                return (self.utt_ids[i], audio, g)
            return (audio, g)

        return self._cached(idx, load)


class AudioLocalDataset(AudioDataset):
    """(audio, local[, global]) tuples for locally-conditioned VQVAE
    training ('local' = e.g. continuous log-f0 + V/UV written by
    bin/preprocess.py --extract-f0)."""

    def __init__(
        self, root_dir,
        local_load_fn: Callable = lambda f: read_hdf5(f, "local"),
        global_load_fn: Optional[Callable] = None,
        **kwargs,
    ):
        super().__init__(root_dir, **kwargs)
        self.local_load_fn = local_load_fn
        self.global_load_fn = global_load_fn

    def __getitem__(self, idx):
        def load(i):
            f = self.audio_files[i]
            audio = self.audio_load_fn(f)
            l = self.local_load_fn(f)
            out = (audio, l)
            if self.global_load_fn is not None:
                g = int(np.asarray(self.global_load_fn(f)).reshape(-1)[0])
                out = out + (g,)
            if self.return_utt_id:
                return (self.utt_ids[i],) + out
            return out

        return self._cached(idx, load)
