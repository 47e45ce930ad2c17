"""Kaldi-style scp datasets (behavioral parity:
/root/reference/parallel_wavegan/datasets/scp_dataset.py:45-354).

The feats-scp kind is sniffed from the first line: "file.h5:path" -> hdf5,
"file.npy" -> npy, otherwise Kaldi binary ark (scp_dataset.py:18-42).
"""

from __future__ import annotations

import logging

import numpy as np

from parallelwavegan_tpu.utils.kaldiio_lite import (
    ArkScpReader,
    HDF5ScpLoader,
    NpyScpLoader,
    WavScpReader,
)


def _get_feats_scp_loader(feats_scp: str):
    with open(feats_scp) as f:
        key, value = f.readlines()[0].replace("\n", "").split()
    if ":" in value:
        value_1, value_2 = value.split(":")
        if value_1.endswith(".ark"):
            return ArkScpReader(feats_scp)
        if value_1.endswith(".h5"):
            return HDF5ScpLoader(feats_scp)
        raise ValueError("Not supported feats.scp type.")
    if value.endswith(".h5"):
        return HDF5ScpLoader(feats_scp)
    if value.endswith(".npy"):
        return NpyScpLoader(feats_scp)
    raise ValueError("Not supported feats.scp type.")


class AudioMelSCPDataset:
    """Paired (audio, mel) dataset from wav.scp + feats.scp."""

    def __init__(
        self,
        wav_scp: str,
        feats_scp: str,
        segments: str | None = None,
        audio_length_threshold: int | None = None,
        mel_length_threshold: int | None = None,
        return_utt_id: bool = False,
        return_sampling_rate: bool = False,
        allow_cache: bool = False,
    ):
        audio_loader = WavScpReader(wav_scp, segments)
        mel_loader = _get_feats_scp_loader(feats_scp)
        audio_keys = audio_loader.keys()
        mel_keys = mel_loader.keys()

        if audio_length_threshold is not None:
            lengths = [audio_loader[k][0].shape[0] for k in audio_keys]
            idxs = [i for i in range(len(audio_keys))
                    if lengths[i] > audio_length_threshold]
            if len(idxs) != len(audio_keys):
                logging.warning(
                    "Some files are filtered by audio length threshold "
                    f"({len(audio_keys)} -> {len(idxs)})."
                )
            audio_keys = [audio_keys[i] for i in idxs]
            mel_keys = [mel_keys[i] for i in idxs]
        if mel_length_threshold is not None:
            lengths = [mel_loader[k].shape[0] for k in mel_keys]
            idxs = [i for i in range(len(mel_keys))
                    if lengths[i] > mel_length_threshold]
            if len(idxs) != len(mel_keys):
                logging.warning(
                    "Some files are filtered by mel length threshold "
                    f"({len(mel_keys)} -> {len(idxs)})."
                )
            audio_keys = [audio_keys[i] for i in idxs]
            mel_keys = [mel_keys[i] for i in idxs]
        assert len(audio_keys) == len(mel_keys)

        self.audio_loader = audio_loader
        self.mel_loader = mel_loader
        self.utt_ids = audio_keys
        self.return_utt_id = return_utt_id
        self.return_sampling_rate = return_sampling_rate
        self.allow_cache = allow_cache
        if allow_cache:
            # plain list, not multiprocessing.Manager: the prefetch loader is
            # threaded, and forking a Manager server after JAX starts its
            # runtime threads can deadlock (see audio_mel_dataset._CachedDataset)
            self.caches = [() for _ in range(len(self.utt_ids))]

    def __len__(self):
        return len(self.utt_ids)

    def __getitem__(self, idx):
        if self.allow_cache and len(self.caches[idx]) != 0:
            return self.caches[idx]
        utt_id = self.utt_ids[idx]
        audio, sr = self.audio_loader[utt_id]
        mel = self.mel_loader[utt_id]
        audio = np.asarray(audio, dtype=np.float32)
        if self.return_sampling_rate:
            audio = (audio, sr)
        if self.return_utt_id:
            items = (utt_id, audio, mel)
        else:
            items = (audio, mel)
        if self.allow_cache:
            self.caches[idx] = items
        return items


class AudioSCPDataset:
    """Audio-only dataset from wav.scp (used by preprocess)."""

    def __init__(
        self,
        wav_scp: str,
        segments: str | None = None,
        audio_length_threshold: int | None = None,
        return_utt_id: bool = False,
        return_sampling_rate: bool = False,
        allow_cache: bool = False,
    ):
        self.audio_loader = WavScpReader(wav_scp, segments)
        self.utt_ids = self.audio_loader.keys()
        if audio_length_threshold is not None:
            lengths = [self.audio_loader[k][0].shape[0] for k in self.utt_ids]
            self.utt_ids = [
                k for k, ln in zip(self.utt_ids, lengths)
                if ln > audio_length_threshold
            ]
        self.return_utt_id = return_utt_id
        self.return_sampling_rate = return_sampling_rate
        self.allow_cache = allow_cache
        if allow_cache:
            # plain list, not multiprocessing.Manager: the prefetch loader is
            # threaded, and forking a Manager server after JAX starts its
            # runtime threads can deadlock (see audio_mel_dataset._CachedDataset)
            self.caches = [() for _ in range(len(self.utt_ids))]

    def __len__(self):
        return len(self.utt_ids)

    def __getitem__(self, idx):
        if self.allow_cache and len(self.caches[idx]) != 0:
            return self.caches[idx]
        utt_id = self.utt_ids[idx]
        audio, sr = self.audio_loader[utt_id]
        audio = np.asarray(audio, dtype=np.float32)
        if self.return_sampling_rate:
            audio = (audio, sr)
        items = (utt_id, audio) if self.return_utt_id else audio
        if self.allow_cache:
            self.caches[idx] = items
        return items


class MelSCPDataset:
    """Mel-only dataset from feats.scp (used by decode)."""

    def __init__(
        self,
        feats_scp: str,
        mel_length_threshold: int | None = None,
        return_utt_id: bool = False,
        allow_cache: bool = False,
    ):
        self.mel_loader = _get_feats_scp_loader(feats_scp)
        self.utt_ids = self.mel_loader.keys()
        if mel_length_threshold is not None:
            lengths = [self.mel_loader[k].shape[0] for k in self.utt_ids]
            self.utt_ids = [
                k for k, ln in zip(self.utt_ids, lengths)
                if ln > mel_length_threshold
            ]
        self.return_utt_id = return_utt_id
        self.allow_cache = allow_cache
        if allow_cache:
            # plain list, not multiprocessing.Manager: the prefetch loader is
            # threaded, and forking a Manager server after JAX starts its
            # runtime threads can deadlock (see audio_mel_dataset._CachedDataset)
            self.caches = [() for _ in range(len(self.utt_ids))]

    def __len__(self):
        return len(self.utt_ids)

    def __getitem__(self, idx):
        if self.allow_cache and len(self.caches[idx]) != 0:
            return self.caches[idx]
        utt_id = self.utt_ids[idx]
        mel = np.asarray(self.mel_loader[utt_id], dtype=np.float32)
        items = (utt_id, mel) if self.return_utt_id else mel
        if self.allow_cache:
            self.caches[idx] = items
        return items
