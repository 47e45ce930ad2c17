"""STFT / log-mel spectrogram primitives, TPU-first.

Behavioral parity targets (reference, for numerics only — no code reused):
  - preprocess-time log-mel: /root/reference/parallel_wavegan/bin/preprocess.py:26-91
    (librosa.stft center/reflect + |.| -> mel -> max(eps) -> log10)
  - loss-time STFT magnitude: /root/reference/parallel_wavegan/losses/stft_loss.py:16-40
    (torch.stft center/reflect -> sqrt(clamp(re^2+im^2, 1e-7)))
  - loss-time mel: /root/reference/parallel_wavegan/losses/mel_loss.py:15-110
    (amp = sqrt(clamp(power, 1e-10)); mel = clamp(amp @ melmat, 1e-10); log10)

TPU design notes:
  - The hot path is expressed as ONE framed matmul against a window-folded
    real-DFT basis (N x 2*bins) so XLA tiles it straight onto the MXU; the
    rfft path exists for exact CPU golden tests.
  - Frames are gathered with a static index matrix (static shapes, jit-safe).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.ops.mel import mel_filter_bank


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window / scipy fftbins=True)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def get_window(window: str, win_length: int, dtype=np.float32) -> np.ndarray:
    if window in ("hann", "hann_window"):
        return hann_window(win_length, dtype)
    if window in ("hamming", "hamming_window"):
        n = np.arange(win_length)
        return (0.54 - 0.46 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)
    if window in ("blackman", "blackman_window"):
        n = np.arange(win_length)
        x = 2.0 * np.pi * n / win_length
        return (0.42 - 0.5 * np.cos(x) + 0.08 * np.cos(2 * x)).astype(dtype)
    if window in ("rect", "rectangular", "ones", None):
        return np.ones(win_length, dtype=dtype)
    raise ValueError(f"unsupported window: {window}")


def pad_center(window: np.ndarray, size: int) -> np.ndarray:
    """Center-pad a window to `size` (librosa.util.pad_center / torch.stft)."""
    n = len(window)
    lpad = (size - n) // 2
    return np.pad(window, (lpad, size - n - lpad))


@functools.lru_cache(maxsize=64)
def _rdft_basis(fft_size: int, win_length: int, window: str):
    """Window-folded real-DFT basis, shape (fft_size, 2*(fft_size//2+1)).

    Columns [0:bins] are w[t]*cos(2 pi k t / N) and [bins:] are
    -w[t]*sin(2 pi k t / N): frames @ basis == [Re(STFT), Im(STFT)].
    Computed in float64 then cast for accuracy.
    """
    w = pad_center(get_window(window, win_length, np.float64), fft_size)
    t = np.arange(fft_size)[:, None]
    k = np.arange(fft_size // 2 + 1)[None, :]
    ang = 2.0 * np.pi * t * k / fft_size
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1) * w[:, None]
    return basis.astype(np.float32)


def frame_signal(x: jnp.ndarray, frame_length: int, hop_size: int) -> jnp.ndarray:
    """Slice (..., T) into overlapping frames (..., n_frames, frame_length)."""
    T = x.shape[-1]
    n_frames = 1 + (T - frame_length) // hop_size
    idx = np.arange(n_frames)[:, None] * hop_size + np.arange(frame_length)[None, :]
    return x[..., idx]


def _center_pad(x: jnp.ndarray, fft_size: int, pad_mode: str) -> jnp.ndarray:
    p = fft_size // 2
    cfg = [(0, 0)] * (x.ndim - 1) + [(p, p)]
    return jnp.pad(x, cfg, mode=pad_mode)


def stft_magnitude(
    x: jnp.ndarray,
    fft_size: int,
    hop_size: int,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
    power_clamp_min: float = 1e-7,
    method: str = "auto",
) -> jnp.ndarray:
    """Magnitude spectrogram of (..., T) -> (..., n_frames, fft_size//2+1).

    method: "matmul" (MXU-friendly framed matmul, TPU default), "fft"
    (jnp.fft.rfft, exact; CPU default), or "auto".
    """
    if win_length is None:
        win_length = fft_size
    if center:
        x = _center_pad(x, fft_size, pad_mode)
    frames = frame_signal(x, fft_size, hop_size)
    if method == "auto":
        method = "matmul" if jax.default_backend() not in ("cpu",) else "fft"
    if method == "matmul":
        basis = jnp.asarray(_rdft_basis(fft_size, win_length, window))
        bins = fft_size // 2 + 1
        proj = jnp.matmul(frames, basis, precision=jax.lax.Precision.HIGHEST)
        power = proj[..., :bins] ** 2 + proj[..., bins:] ** 2
    else:
        w = jnp.asarray(
            pad_center(get_window(window, win_length, np.float32), fft_size)
        )
        spec = jnp.fft.rfft(frames * w, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.sqrt(jnp.clip(power, min=power_clamp_min))


def log_mel_spectrogram_numpy(
    audio: np.ndarray,
    sampling_rate: int,
    fft_size: int = 1024,
    hop_size: int = 256,
    win_length: Optional[int] = None,
    window: str = "hann",
    num_mels: int = 80,
    fmin: Optional[float] = None,
    fmax: Optional[float] = None,
    eps: float = 1e-10,
    log_base: Optional[float] = 10.0,
) -> np.ndarray:
    """Pure-numpy log-mel for host-side preprocessing: no jit, no device,
    no per-length recompiles (variable-length utterances). Matches
    log_mel_spectrogram(method='fft') numerics."""
    if win_length is None:
        win_length = fft_size
    x = np.asarray(audio, dtype=np.float32)
    p = fft_size // 2
    x = np.pad(x, (p, p), mode="reflect")
    n_frames = 1 + (len(x) - fft_size) // hop_size
    idx = (
        np.arange(n_frames)[:, None] * hop_size
        + np.arange(fft_size)[None, :]
    )
    frames = x[idx] * pad_center(
        get_window(window, win_length, np.float32), fft_size
    )
    spec = np.fft.rfft(frames, axis=-1)
    amp = np.abs(spec)
    fmin = 0.0 if fmin is None else fmin
    fmax = sampling_rate / 2.0 if fmax is None else fmax
    melmat = mel_filter_bank(sampling_rate, fft_size, num_mels, fmin, fmax)
    mel = np.maximum(amp @ melmat.T, eps)
    if log_base is None:
        return np.log(mel)
    return np.log(mel) / math.log(log_base)


def log_mel_spectrogram(
    x: jnp.ndarray,
    sampling_rate: int,
    fft_size: int = 1024,
    hop_size: int = 256,
    win_length: Optional[int] = None,
    window: str = "hann",
    num_mels: int = 80,
    fmin: Optional[float] = None,
    fmax: Optional[float] = None,
    eps: float = 1e-10,
    log_base: Optional[float] = 10.0,
    clamp_amplitude: bool = False,
    center: bool = True,
    pad_mode: str = "reflect",
    method: str = "auto",
) -> jnp.ndarray:
    """Log-mel spectrogram of (..., T) -> (..., n_frames, num_mels).

    With clamp_amplitude=False this matches the preprocess-time
    `logmelfilterbank` (amp unclamped; mel clamped at eps); with True it
    matches the train-time MelSpectrogram loss (amp clamped at sqrt(eps)).
    """
    fmin = 0.0 if fmin is None else fmin
    fmax = sampling_rate / 2.0 if fmax is None else fmax
    clamp = eps if clamp_amplitude else 0.0
    amp = stft_magnitude(
        x, fft_size, hop_size, win_length, window,
        center=center, pad_mode=pad_mode, power_clamp_min=clamp, method=method,
    )
    melmat = jnp.asarray(
        mel_filter_bank(sampling_rate, fft_size, num_mels, fmin, fmax).T
    )
    mel = jnp.matmul(amp, melmat, precision=jax.lax.Precision.HIGHEST)
    mel = jnp.maximum(mel, eps)
    if log_base is None:
        return jnp.log(mel)
    return jnp.log(mel) / math.log(log_base)
