"""File IO: hdf5/npy feature files, WAV read/write, YAML config loading.

Byte-compatible with the reference's dump format (hdf5 keys "wave"/"feats"/
"f0"/"excitation"/"local"/"global", *-wave.npy/*-feats.npy pairs) so feature
dumps interoperate both ways (reference utils/utils.py:61-280,
bin/preprocess.py:454-529). WAV IO is scipy-based (soundfile is not in this
image); PCM16 in/out with float32 [-1, 1) normalization.
"""

from __future__ import annotations

import fnmatch
import logging
import os
from typing import Any, Dict, List, Optional

import h5py
import numpy as np
import yaml


def find_files(root_dir: str, query: str = "*.wav",
               include_root_dir: bool = True) -> List[str]:
    """Recursively collect files matching `query` (sorted)."""
    files = []
    for root, _, filenames in os.walk(root_dir, followlinks=True):
        for filename in fnmatch.filter(filenames, query):
            files.append(os.path.join(root, filename))
    files = sorted(files)
    if not include_root_dir:
        files = [f.replace(root_dir + "/", "") for f in files]
    return files


def read_hdf5(hdf5_name: str, hdf5_path: str) -> np.ndarray:
    """Read a dataset from an hdf5 file."""
    if not os.path.exists(hdf5_name):
        raise FileNotFoundError(f"There is no such a hdf5 file ({hdf5_name}).")
    with h5py.File(hdf5_name, "r") as f:
        if hdf5_path not in f:
            raise KeyError(
                f"There is no such a data in hdf5 file ({hdf5_path} in {hdf5_name})."
            )
        return f[hdf5_path][()]


def write_hdf5(hdf5_name: str, hdf5_path: str, write_data,
               is_overwrite: bool = True) -> None:
    """Write a dataset into an hdf5 file, creating parents as needed."""
    write_data = np.asarray(write_data)
    folder = os.path.dirname(hdf5_name)
    if folder and not os.path.exists(folder):
        os.makedirs(folder, exist_ok=True)
    with h5py.File(hdf5_name, "a") as f:
        if hdf5_path in f:
            if not is_overwrite:
                raise RuntimeError(
                    f"Dataset {hdf5_path} already exists in {hdf5_name}."
                )
            del f[hdf5_path]
        f.create_dataset(hdf5_path, data=write_data)


def read_wav(path):
    """Read a WAV file (path or file-like) -> (wave float32 in [-1, 1),
    sampling_rate)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 2**15
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2**31
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return data, sr


def write_wav(path: str, wave: np.ndarray, sampling_rate: int,
              subtype: str = "PCM_16") -> None:
    """Write float wave in [-1, 1] as 16-bit PCM WAV."""
    from scipy.io import wavfile

    folder = os.path.dirname(path)
    if folder:
        os.makedirs(folder, exist_ok=True)
    assert subtype == "PCM_16"
    wave = np.asarray(wave)
    if wave.dtype == np.int16:
        # already device-converted PCM (InferenceModel pcm16=True)
        wavfile.write(path, sampling_rate, wave)
        return
    data = np.clip(wave.astype(np.float64), -1.0, 1.0)
    wavfile.write(path, sampling_rate, (data * 32767.0).astype(np.int16))


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None
                ) -> Dict[str, Any]:
    """Load a (reference-compatible) YAML experiment config."""
    with open(path) as f:
        config = yaml.load(f, Loader=yaml.SafeLoader)
    if overrides:
        config.update(overrides)
    return config


def save_config(path: str, config: Dict[str, Any]) -> None:
    folder = os.path.dirname(path)
    if folder:
        os.makedirs(folder, exist_ok=True)
    with open(path, "w") as f:
        yaml.dump(config, f, Dumper=yaml.SafeDumper)
