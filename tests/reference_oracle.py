"""Import helpers for using the read-only reference repo as a numeric oracle.

The reference (PyTorch) is used ONLY as a test-time golden oracle; no code is
copied from it. Imports are shimmed for newer scipy (kaiser moved to
scipy.signal.windows). Tests that use this module must skip gracefully when
the reference tree is absent.
"""

import sys

import pytest

REFERENCE_ROOT = "/root/reference"


def _shim_librosa():
    """Install a minimal librosa stand-in (librosa is not in this image).

    Only `librosa.filters.mel` is provided, backed by our own slaney
    filterbank. Parity tests that go through this shim therefore validate the
    STFT/eps/log pipeline, not the mel matrix itself (covered separately by
    invariant tests).
    """
    try:
        import librosa  # noqa: F401

        return
    except ImportError:
        pass
    import types

    import numpy as np

    from parallelwavegan_tpu.ops.mel import mel_filter_bank

    librosa = types.ModuleType("librosa")
    filters = types.ModuleType("librosa.filters")

    def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kwargs):
        return np.asarray(mel_filter_bank(sr, n_fft, n_mels, fmin, fmax))

    filters.mel = mel
    librosa.filters = filters
    librosa.__version__ = "0.0-shim"
    sys.modules["librosa"] = librosa
    sys.modules["librosa.filters"] = filters


def import_reference():
    """Return the `parallel_wavegan` package from the reference, or skip."""
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not available")
    import scipy.signal

    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = scipy.signal.windows.kaiser
    _shim_librosa()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        import parallel_wavegan  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return sys.modules["parallel_wavegan"]
