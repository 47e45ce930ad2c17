"""Loss parity tests vs the reference torch implementations on random data."""

import numpy as np
import pytest

import jax.numpy as jnp

from parallelwavegan_tpu.losses import (
    DiscriminatorAdversarialLoss,
    DurationPredictorLoss,
    FeatureMatchLoss,
    GeneratorAdversarialLoss,
    MelSpectrogramLoss,
    MultiResolutionSTFTLoss,
)


@pytest.fixture(scope="module")
def ref():
    from tests.reference_oracle import import_reference

    import_reference()
    import parallel_wavegan.losses as ref_losses

    return ref_losses


def test_multi_resolution_stft_loss_matches_reference(ref):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    y = rng.standard_normal((2, 8192)).astype(np.float32)
    sc, mag = MultiResolutionSTFTLoss(method="fft")(jnp.asarray(x), jnp.asarray(y))
    with torch.no_grad():
        sc_r, mag_r = ref.MultiResolutionSTFTLoss()(
            torch.from_numpy(x), torch.from_numpy(y)
        )
    np.testing.assert_allclose(float(sc), float(sc_r), rtol=1e-4)
    np.testing.assert_allclose(float(mag), float(mag_r), rtol=1e-4)


def test_subband_stft_loss_shape():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 2048)).astype(np.float32)
    y = rng.standard_normal((2, 4, 2048)).astype(np.float32)
    loss = MultiResolutionSTFTLoss(
        fft_sizes=[384, 683, 171], hop_sizes=[30, 60, 10],
        win_lengths=[150, 300, 60], method="fft",
    )
    sc, mag = loss(jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(sc)) and np.isfinite(float(mag))


def test_mel_loss_finite_and_symmetricish():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8192)).astype(np.float32) * 0.1
    loss = MelSpectrogramLoss(method="fft")
    v = loss(jnp.asarray(x), jnp.asarray(x))
    assert float(v) == 0.0
    y = rng.standard_normal((2, 8192)).astype(np.float32) * 0.1
    assert float(loss(jnp.asarray(x), jnp.asarray(y))) > 0.0


def test_mel_loss_matches_reference(ref):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    y = rng.standard_normal((2, 8192)).astype(np.float32)
    ours = MelSpectrogramLoss(method="fft")(jnp.asarray(x), jnp.asarray(y))
    with torch.no_grad():
        r = ref.MelSpectrogramLoss()(torch.from_numpy(x), torch.from_numpy(y))
    np.testing.assert_allclose(float(ours), float(r), rtol=1e-4)


@pytest.mark.parametrize("loss_type", ["mse", "hinge"])
def test_adversarial_losses_match_reference(ref, loss_type):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    outs_hat = [rng.standard_normal((2, 100, 1)).astype(np.float32)
                for _ in range(3)]
    outs = [rng.standard_normal((2, 100, 1)).astype(np.float32)
            for _ in range(3)]

    g = GeneratorAdversarialLoss(loss_type=loss_type)
    d = DiscriminatorAdversarialLoss(loss_type=loss_type)
    g_ours = g([jnp.asarray(o) for o in outs_hat])
    real_ours, fake_ours = d(
        [jnp.asarray(o) for o in outs_hat], [jnp.asarray(o) for o in outs]
    )
    with torch.no_grad():
        g_ref = ref.GeneratorAdversarialLoss(loss_type=loss_type)(
            [torch.from_numpy(o) for o in outs_hat]
        )
        real_ref, fake_ref = ref.DiscriminatorAdversarialLoss(
            loss_type=loss_type
        )([torch.from_numpy(o) for o in outs_hat],
          [torch.from_numpy(o) for o in outs])
    np.testing.assert_allclose(float(g_ours), float(g_ref), rtol=1e-5)
    np.testing.assert_allclose(float(real_ours), float(real_ref), rtol=1e-5)
    np.testing.assert_allclose(float(fake_ours), float(fake_ref), rtol=1e-5)


def test_feature_match_loss_matches_reference(ref):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    feats_hat = [
        [rng.standard_normal((2, 50, 8)).astype(np.float32) for _ in range(4)]
        for _ in range(2)
    ]
    feats = [
        [rng.standard_normal((2, 50, 8)).astype(np.float32) for _ in range(4)]
        for _ in range(2)
    ]
    ours = FeatureMatchLoss()(
        [[jnp.asarray(f) for f in fl] for fl in feats_hat],
        [[jnp.asarray(f) for f in fl] for fl in feats],
    )
    with torch.no_grad():
        r = ref.FeatureMatchLoss()(
            [[torch.from_numpy(f) for f in fl] for fl in feats_hat],
            [[torch.from_numpy(f) for f in fl] for fl in feats],
        )
    np.testing.assert_allclose(float(ours), float(r), rtol=1e-5)


def test_duration_predictor_loss_matches_reference(ref):
    torch = pytest.importorskip("torch")
    from parallel_wavegan.losses import DurationPredictorLoss as RefDPL

    rng = np.random.default_rng(6)
    pred = rng.standard_normal((2, 20)).astype(np.float32)
    target = rng.integers(0, 10, (2, 20))
    ours = DurationPredictorLoss()(jnp.asarray(pred), jnp.asarray(target))
    with torch.no_grad():
        r = RefDPL()(torch.from_numpy(pred), torch.from_numpy(target))
    np.testing.assert_allclose(float(ours), float(r), rtol=1e-5)
