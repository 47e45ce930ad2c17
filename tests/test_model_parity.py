"""Golden parity: import reference torch model weights and compare forwards.

For each family, a reference (PyTorch) model is randomly initialized, its
state_dict imported through utils.torch_import, and outputs compared on the
same inputs. Layouts: ours (B, T, C) vs torch (B, C, T).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.utils.torch_import import import_model_params

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module", autouse=True)
def _ref():
    from tests.reference_oracle import import_reference

    import_reference()


def _bct(x):
    return np.asarray(x).transpose(0, 2, 1)


def _build_pair(name, config, ours_config=None):
    import parallel_wavegan.models as ref_models

    torch.manual_seed(0)
    ref = getattr(ref_models, name)(**config)
    ref.eval()
    ours_cls = get_model_class(name)
    ours = ours_cls(**(ours_config if ours_config is not None else config))
    variables = import_model_params(ref.state_dict(), name, config)
    return ref, ours, variables


def test_parallel_wavegan_generator_parity():
    config = dict(
        layers=6, stacks=3, residual_channels=16, gate_channels=32,
        skip_channels=16, aux_channels=20, aux_context_window=2,
        upsample_params={"upsample_scales": [4, 4]},
    )
    ref, ours, variables = _build_pair("ParallelWaveGANGenerator", config)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, 1, 16 * 16)).astype(np.float32)
    c = rng.standard_normal((2, 20, 16 + 4)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(z), torch.from_numpy(c)).numpy()
    out = ours.apply(
        variables, jnp.asarray(z.transpose(0, 2, 1)),
        jnp.asarray(c.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(_bct(out), out_ref, rtol=1e-4, atol=1e-5)


def test_parallel_wavegan_discriminator_parity():
    config = dict(layers=5, conv_channels=16)
    ref, ours, variables = _build_pair("ParallelWaveGANDiscriminator", config)
    x = np.random.default_rng(1).standard_normal((2, 1, 2048)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()
    out = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(_bct(out), out_ref, rtol=1e-4, atol=1e-5)


def test_residual_parallel_wavegan_discriminator_parity():
    config = dict(
        layers=6, stacks=3, residual_channels=16, gate_channels=32,
        skip_channels=16,
    )
    ref, ours, variables = _build_pair(
        "ResidualParallelWaveGANDiscriminator", config
    )
    x = np.random.default_rng(2).standard_normal((2, 1, 2048)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()
    out = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(_bct(out), out_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_melgan_generator_parity(causal):
    config = dict(
        in_channels=20, channels=64, upsample_scales=[4, 4], stacks=2,
        use_causal_conv=causal,
    )
    ref, ours, variables = _build_pair("MelGANGenerator", config)
    c = np.random.default_rng(3).standard_normal((2, 20, 16)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(c)).numpy()
    out = ours.apply(variables, jnp.asarray(c.transpose(0, 2, 1)))
    np.testing.assert_allclose(_bct(out), out_ref, rtol=1e-4, atol=1e-5)


def test_melgan_multiscale_discriminator_parity():
    config = dict(channels=16, downsample_scales=[4, 4], scales=2)
    ref, ours, variables = _build_pair("MelGANMultiScaleDiscriminator", config)
    x = np.random.default_rng(4).standard_normal((2, 1, 4096)).astype(np.float32)
    with torch.no_grad():
        outs_ref = ref(torch.from_numpy(x))
    outs = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))
    assert len(outs) == len(outs_ref)
    for fl, fl_ref in zip(outs, outs_ref):
        assert len(fl) == len(fl_ref)
        for f, f_ref in zip(fl, fl_ref):
            np.testing.assert_allclose(
                _bct(f), f_ref.numpy(), rtol=1e-4, atol=1e-5
            )


@pytest.mark.parametrize("causal", [False, True])
def test_hifigan_generator_parity(causal):
    config = dict(
        in_channels=20, channels=64, upsample_scales=(4, 4),
        upsample_kernel_sizes=(8, 8), resblock_kernel_sizes=(3, 5),
        resblock_dilations=[(1, 3), (1, 3)], use_causal_conv=causal,
    )
    ref, ours, variables = _build_pair("HiFiGANGenerator", config)
    c = np.random.default_rng(5).standard_normal((2, 20, 16)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(c)).numpy()
    out = ours.apply(variables, jnp.asarray(c.transpose(0, 2, 1)))
    np.testing.assert_allclose(_bct(out), out_ref, rtol=1e-4, atol=1e-5)


def test_hifigan_period_discriminator_parity():
    # note: the reference's channel progression requires the cap to be hit
    config = dict(period=3, channels=8, downsample_scales=[3, 3, 1],
                  max_downsample_channels=32)
    ref, ours, variables = _build_pair("HiFiGANPeriodDiscriminator", config)
    x = np.random.default_rng(6).standard_normal((2, 1, 2048)).astype(np.float32)
    with torch.no_grad():
        outs_ref = ref(torch.from_numpy(x))
    outs = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))
    # intermediate maps: ours (B, H, W, C) vs torch (B, C, H, W)
    for f, f_ref in zip(outs[:-1], outs_ref[:-1]):
        np.testing.assert_allclose(
            np.asarray(f).transpose(0, 3, 1, 2), f_ref.numpy(),
            rtol=1e-4, atol=1e-5,
        )
    # final: both flattened from a single output channel -- ours (B, T', P, 1)
    # and torch (B, 1, T', P) flatten to the identical element order, so
    # compare values directly (no permutation-insensitive sort).
    f = np.asarray(outs[-1])
    fr = outs_ref[-1].numpy()
    np.testing.assert_allclose(f, fr, rtol=1e-4, atol=1e-5)


def test_hifigan_msd_official_norm_parity():
    """MSD with follow_official_norm: scale 0 uses spectral norm.

    Torch applies one power iteration per *training* forward; our conv does
    the same given the imported u, so compare against the torch model in
    train mode under no_grad.
    """
    config = dict(
        scales=2,
        discriminator_params={
            "channels": 16, "downsample_scales": [2, 2], "max_groups": 4,
        },
        follow_official_norm=True,
    )
    ref, ours, variables = _build_pair("HiFiGANMultiScaleDiscriminator", config)
    ref.train()
    x = np.random.default_rng(7).standard_normal((2, 1, 4096)).astype(np.float32)
    with torch.no_grad():
        outs_ref = ref(torch.from_numpy(x))
    outs, _ = ours.apply(
        variables, jnp.asarray(x.transpose(0, 2, 1)), False,
        mutable=["spectral"],
    )
    for fl, fl_ref in zip(outs, outs_ref):
        for f, f_ref in zip(fl, fl_ref):
            np.testing.assert_allclose(
                _bct(f), f_ref.numpy(), rtol=1e-3, atol=1e-4
            )


def test_style_melgan_generator_parity():
    config = dict(
        in_channels=32, aux_channels=20, channels=16,
        noise_upsample_scales=[4, 2], upsample_scales=[2, 2, 1],
    )
    ref, ours, variables = _build_pair("StyleMelGANGenerator", config)
    rng = np.random.default_rng(8)
    # mel length must equal the noise-upsampled length (z len 1 * 4 * 2)
    c = rng.standard_normal((2, 20, 8)).astype(np.float32)
    z = rng.standard_normal((2, 32, 1)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(c), torch.from_numpy(z)).numpy()
    out = ours.apply(
        variables, jnp.asarray(c.transpose(0, 2, 1)),
        jnp.asarray(z.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(_bct(out), out_ref, rtol=1e-4, atol=1e-5)


def test_style_melgan_generator_parity_multi_frame_noise():
    """Mels longer than one noise_upsample_factor need >1 noise frame
    (reference style_melgan.py:216-221). Round 4 found the single-frame
    assumption baked into inference/synthesize_batch — this pins the
    multi-frame path against the reference forward."""
    config = dict(
        in_channels=32, aux_channels=20, channels=16,
        noise_upsample_scales=[4, 2], upsample_scales=[2, 2, 1],
    )
    ref, ours, variables = _build_pair("StyleMelGANGenerator", config)
    rng = np.random.default_rng(9)
    # 3 noise frames -> noise-upsampled length 24; mel matches it
    c = rng.standard_normal((2, 20, 24)).astype(np.float32)
    z = rng.standard_normal((2, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(c), torch.from_numpy(z)).numpy()
    out = ours.apply(
        variables, jnp.asarray(c.transpose(0, 2, 1)),
        jnp.asarray(z.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(_bct(out), out_ref, rtol=1e-4, atol=1e-5)


def test_style_melgan_inference_long_mel_length():
    """inference() on a mel that is not a multiple of (and longer than)
    the noise-upsample factor: output must be exactly T'*upsample_factor
    (the pop-noise crop, reference style_melgan.py:227-238)."""
    from parallelwavegan_tpu.models import get_model_class

    cls = get_model_class("StyleMelGANGenerator")
    ours = cls(
        in_channels=32, aux_channels=20, channels=16,
        noise_upsample_scales=[4, 2], upsample_scales=[2, 2, 1],
    )
    c = np.random.default_rng(3).standard_normal((21, 20)).astype(np.float32)
    variables = ours.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 8, 20)),
    )
    y = ours.inference(variables, c, rng=jax.random.key(2))
    # 21 frames -> 3 noise frames (ceil(21/8)), crop back to 21 * 4
    assert y.shape == (21 * 4, 1)


def test_style_melgan_discriminator_parity(monkeypatch):
    """Value parity with pinned window starts: the reference draws starts
    from global np RNG (style_melgan.py:330), so pin np.random.randint to a
    deterministic per-call sequence and pass the identical starts to ours via
    the window_starts override.  This exercises the window slicing + PQMF
    analysis + per-window MelGAN discriminators end to end at value level."""
    config = dict(
        window_sizes=[256, 512, 1024, 2048],
        discriminator_params={"channels": 8, "downsample_scales": [4, 1],
                              "max_downsample_channels": 64},
    )
    ref, ours, variables = _build_pair("StyleMelGANDiscriminator", config)
    x = np.random.default_rng(9).standard_normal((2, 1, 4096)).astype(np.float32)
    # 2 repeats x 4 windows; vary starts so an off-by-one in slicing shows up
    starts = [0, 33, 128, 1024, 17, 100, 512, 2048]
    it = iter(starts)
    monkeypatch.setattr(np.random, "randint", lambda *a, **k: next(it))
    with torch.no_grad():
        outs_ref = ref(torch.from_numpy(x))
    outs = ours.apply(
        variables, jnp.asarray(x.transpose(0, 2, 1)),
        window_starts=starts,
    )
    assert len(outs) == len(outs_ref) == 2 * len(config["window_sizes"])
    for fl, fl_ref in zip(outs, outs_ref):
        assert len(fl) == len(fl_ref)
        for f, f_ref in zip(fl, fl_ref):
            np.testing.assert_allclose(
                _bct(f), f_ref.numpy(), rtol=1e-4, atol=1e-4
            )
