"""DSP core golden tests: STFT vs torch.stft, mel invariants, PQMF parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from parallelwavegan_tpu.ops import (
    log_mel_spectrogram,
    mel_filter_bank,
    pqmf_analysis,
    pqmf_synthesis,
    stft_magnitude,
)
from parallelwavegan_tpu.ops.spectral import get_window


@pytest.mark.parametrize(
    "fft,hop,win", [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240), (1024, 256, 1024)]
)
def test_stft_magnitude_matches_torch(fft, hop, win):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8192)).astype(np.float32)

    ours = np.asarray(stft_magnitude(jnp.asarray(x), fft, hop, win, method="fft"))

    xt = torch.from_numpy(x)
    spec = torch.stft(
        xt, fft, hop, win, torch.hann_window(win), return_complex=True
    )
    ref = torch.sqrt(
        torch.clamp(spec.real**2 + spec.imag**2, min=1e-7)
    ).transpose(2, 1).numpy()

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_stft_matmul_matches_fft():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    a = np.asarray(stft_magnitude(x, 1024, 256, 1024, method="fft"))
    b = np.asarray(stft_magnitude(x, 1024, 256, 1024, method="matmul"))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_window_matches_torch():
    torch = pytest.importorskip("torch")
    for n in (240, 600, 1024):
        np.testing.assert_allclose(
            get_window("hann", n), torch.hann_window(n).numpy(), atol=1e-6
        )


def test_mel_filter_bank_invariants():
    fb = mel_filter_bank(22050, 1024, 80, 80.0, 7600.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter is a single triangle: one contiguous support region
    for row in fb:
        nz = np.flatnonzero(row > 0)
        assert len(nz) > 0
        assert (np.diff(nz) == 1).all()
    # Slaney normalization: rows integrate to ~2/(width in Hz) * area = 1
    # i.e. sum(row) * df ~ 1 for interior filters
    df = 22050 / 2 / 512
    sums = fb.sum(axis=1) * df
    assert np.all(sums[5:-5] > 0.8) and np.all(sums[5:-5] < 1.2)


def test_log_mel_matches_reference_preprocess():
    """Our log-mel vs the reference's librosa-based logmelfilterbank.

    Skipped when librosa is unavailable (it is not baked into this image);
    the torch.stft parity test above plus mel invariants cover the pieces.
    """
    librosa = pytest.importorskip("librosa")
    if getattr(librosa, "__version__", "") == "0.0-shim":
        pytest.skip("only the librosa shim is available (no librosa.stft)")
    from tests.reference_oracle import import_reference

    import_reference()
    from parallel_wavegan.bin.preprocess import logmelfilterbank

    rng = np.random.default_rng(2)
    x = rng.standard_normal(22050).astype(np.float32)
    ref = logmelfilterbank(x, 22050, fft_size=1024, hop_size=256)
    ours = np.asarray(
        log_mel_spectrogram(jnp.asarray(x), 22050, 1024, 256, method="fft")
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_pqmf_matches_reference():
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import import_reference

    import_reference()
    from parallel_wavegan.layers import PQMF

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4096)).astype(np.float32)

    ref_pqmf = PQMF(subbands=4)
    with torch.no_grad():
        ref_sub = ref_pqmf.analysis(torch.from_numpy(x)[:, None, :]).numpy()
        ref_full = ref_pqmf.synthesis(torch.from_numpy(ref_sub)).numpy()

    sub = np.asarray(pqmf_analysis(jnp.asarray(x)[:, :, None], subbands=4))
    np.testing.assert_allclose(
        sub.transpose(0, 2, 1), ref_sub, rtol=1e-4, atol=1e-4
    )
    full = np.asarray(pqmf_synthesis(jnp.asarray(sub), subbands=4))
    np.testing.assert_allclose(
        full.transpose(0, 2, 1), ref_full, rtol=1e-4, atol=1e-4
    )


def test_pqmf_near_perfect_reconstruction():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 8192, 1)).astype(np.float32)
    y = np.asarray(pqmf_synthesis(pqmf_analysis(jnp.asarray(x))))
    # group delay = taps; compare interior with shift of taps samples
    taps = 62
    a = x[0, taps : -taps, 0]
    b = y[0, taps : -taps, 0]
    # align by cross-correlation peak within +-taps
    lags = np.arange(-taps, taps + 1)
    cors = [np.dot(a, np.roll(b, l)) for l in lags]
    best = lags[int(np.argmax(cors))]
    b = np.roll(b, best)
    err = np.sqrt(np.mean((a[taps:-taps] - b[taps:-taps]) ** 2))
    assert err < 0.05, err


def test_conv_transpose1d_polyphase_matches_lhs_dilated():
    """The polyphase formulation (ops/conv.py) must match the lhs-dilated
    torch-semantics conv_transpose1d bit-for-bit in f32 tolerances."""
    import jax.numpy as jnp

    from parallelwavegan_tpu.ops.conv import (
        conv_transpose1d,
        conv_transpose1d_polyphase,
    )

    rng = np.random.default_rng(0)
    for (k, s, pad, op) in [
        (16, 8, 4, 0), (4, 2, 1, 0), (10, 5, 2, 1), (2, 2, 0, 0),
        (7, 3, 2, 0), (20, 11, 4, 3), (3, 1, 1, 0),
    ]:
        x = jnp.asarray(rng.standard_normal((2, 37, 5)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, 5, 7)), jnp.float32)
        b = jnp.asarray(rng.standard_normal(7), jnp.float32)
        a = conv_transpose1d(x, w, b, s, pad, op)
        c = conv_transpose1d_polyphase(x, w, b, s, pad, op)
        assert a.shape == c.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-5, atol=2e-5
        )


def test_pqmf_bf16_serving_dtype():
    """PQMF analysis/synthesis must accept bf16 inputs (serving path)."""
    import jax.numpy as jnp

    from parallelwavegan_tpu.ops.pqmf import pqmf_analysis, pqmf_synthesis

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 256, 1)), jnp.bfloat16
    )
    sub = pqmf_analysis(x, subbands=4)
    assert sub.dtype == jnp.bfloat16 and sub.shape == (2, 64, 4)
    y = pqmf_synthesis(sub, subbands=4)
    assert y.dtype == jnp.bfloat16 and y.shape == (2, 256, 1)


def test_logf0_and_vuv_local_features():
    """Continuous log-f0 + V/UV local features: voiced sine at 220 Hz must
    yield lf0 ~= log(220) on voiced frames and a binary V/UV column."""
    from parallelwavegan_tpu.ops.audio import logf0_and_vuv

    sr, hop = 16000, 256
    t = np.arange(sr)  # 1 s
    audio = np.concatenate([
        0.5 * np.sin(2 * np.pi * 220 * t / sr),
        0.005 * np.random.default_rng(0).standard_normal(sr // 2),
    ]).astype(np.float32)
    local = logf0_and_vuv(audio, sr, hop)
    assert local is not None and local.shape[1] == 2
    vuv = local[:, 1]
    assert set(np.unique(vuv)) <= {0.0, 1.0}
    voiced = local[vuv == 1, 0]
    assert len(voiced) > 10
    np.testing.assert_allclose(
        np.median(voiced), np.log(220.0), rtol=0.02
    )
    # continuous: no NaN/inf anywhere, including unvoiced frames
    assert np.isfinite(local).all()
