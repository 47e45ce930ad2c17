"""Import helpers for using the read-only reference repo as a numeric oracle.

The reference (PyTorch) is used ONLY as a test-time golden oracle; no code is
copied from it. Imports are shimmed for newer scipy (kaiser moved to
scipy.signal.windows). Tests that use this module must skip gracefully when
the reference tree is absent.
"""

import sys

import pytest

REFERENCE_ROOT = "/root/reference"


def import_reference():
    """Return the `parallel_wavegan` package from the reference, or skip."""
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not available")
    import scipy.signal

    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = scipy.signal.windows.kaiser
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        import parallel_wavegan  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return sys.modules["parallel_wavegan"]
