"""End-to-end copy-synthesis parity: reference torch checkpoint ->
load_model -> inference matches the reference model.inference
(the minimum end-to-end slice of SURVEY.md section 7)."""

import numpy as np
import pytest

from parallelwavegan_tpu.utils.model_loader import load_model

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module", autouse=True)
def _ref():
    from tests.reference_oracle import import_reference

    import_reference()


def _save_reference_ckpt(tmp_path, gen, config):
    import yaml

    path = str(tmp_path / "checkpoint-1000steps.pkl")
    torch.save({"model": {"generator": gen.state_dict()}, "steps": 1000}, path)
    with open(tmp_path / "config.yml", "w") as f:
        yaml.dump(config, f)
    return path


def test_melgan_copy_synthesis_parity(tmp_path):
    import parallel_wavegan.models as ref_models

    gen_params = {
        "in_channels": 20, "out_channels": 1, "channels": 64,
        "upsample_scales": [4, 4], "stacks": 2,
    }
    config = {
        "generator_type": "MelGANGenerator",
        "generator_params": gen_params,
        "hop_size": 16,
    }
    torch.manual_seed(0)
    ref = ref_models.MelGANGenerator(**gen_params)
    ref.remove_weight_norm()
    ref.apply_weight_norm()
    ref.eval()
    path = _save_reference_ckpt(tmp_path, ref, config)

    model = load_model(path)
    mel = np.random.default_rng(0).standard_normal((30, 20)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.inference(torch.from_numpy(mel)).numpy()
    out = model.inference(mel)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-5)


def test_multiband_melgan_copy_synthesis_parity(tmp_path):
    import parallel_wavegan.models as ref_models
    from parallel_wavegan.layers import PQMF as RefPQMF

    gen_params = {
        "in_channels": 20, "out_channels": 4, "channels": 64,
        "upsample_scales": [2, 2], "stacks": 2,
    }
    config = {
        "generator_type": "MelGANGenerator",
        "generator_params": gen_params,
        "hop_size": 16,
        # without a version key load_model applies the <=0.4.2 legacy PQMF
        # prototype (reference utils/utils.py:350-357); this checkpoint
        # pairs with a current-defaults PQMF, so declare a modern version
        "version": "0.6.1",
    }
    torch.manual_seed(1)
    ref = ref_models.MelGANGenerator(**gen_params)
    ref.eval()
    ref.pqmf = RefPQMF(subbands=4)
    path = _save_reference_ckpt(tmp_path, ref, config)

    model = load_model(path)
    mel = np.random.default_rng(1).standard_normal((24, 20)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.inference(torch.from_numpy(mel)).numpy()
    out = model.inference(mel)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-5)


def test_pwg_copy_synthesis_shapes_and_stats(tmp_path):
    """PWG inference draws internal noise -> compare shapes/stats, and
    normalize_before parity of the stats path."""
    import parallel_wavegan.models as ref_models

    gen_params = {
        "layers": 6, "stacks": 3, "residual_channels": 16,
        "gate_channels": 32, "skip_channels": 16, "aux_channels": 20,
        "aux_context_window": 2,
        "upsample_params": {"upsample_scales": [4, 4]},
    }
    config = {
        "generator_type": "ParallelWaveGANGenerator",
        "generator_params": gen_params,
        "hop_size": 16,
    }
    torch.manual_seed(2)
    ref = ref_models.ParallelWaveGANGenerator(**gen_params)
    ref.eval()
    path = _save_reference_ckpt(tmp_path, ref, config)

    stats = np.stack(
        [np.zeros(20, np.float32), np.ones(20, np.float32)]
    )
    np.save(tmp_path / "stats.npy", stats)
    model = load_model(path, stats=str(tmp_path / "stats.npy"))
    mel = np.random.default_rng(2).standard_normal((40, 20)).astype(np.float32)
    out = model.inference(mel, normalize_before=True)
    assert out.shape == (40 * 16, 1)
    assert np.isfinite(out).all()


def test_hifigan_copy_synthesis_parity(tmp_path):
    import parallel_wavegan.models as ref_models

    gen_params = {
        "in_channels": 20, "channels": 64, "upsample_scales": [4, 4],
        "upsample_kernel_sizes": [8, 8], "resblock_kernel_sizes": [3],
        "resblock_dilations": [[1, 3]],
    }
    config = {
        "generator_type": "HiFiGANGenerator",
        "generator_params": gen_params,
        "hop_size": 16,
    }
    torch.manual_seed(3)
    ref = ref_models.HiFiGANGenerator(**gen_params)
    ref.eval()
    path = _save_reference_ckpt(tmp_path, ref, config)

    model = load_model(path)
    mel = np.random.default_rng(3).standard_normal((40, 20)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.inference(torch.from_numpy(mel)).numpy()
    out = model.inference(mel)
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-5)


def test_batched_bucketed_synthesis(tmp_path):
    import parallel_wavegan.models as ref_models

    gen_params = {
        "in_channels": 20, "channels": 64, "upsample_scales": [4, 4],
        "upsample_kernel_sizes": [8, 8], "resblock_kernel_sizes": [3],
        "resblock_dilations": [[1, 3]],
    }
    config = {
        "generator_type": "HiFiGANGenerator",
        "generator_params": gen_params,
        "hop_size": 16,
    }
    torch.manual_seed(4)
    ref = ref_models.HiFiGANGenerator(**gen_params)
    ref.eval()
    path = _save_reference_ckpt(tmp_path, ref, config)
    model = load_model(path)

    rng = np.random.default_rng(4)
    mels = [
        rng.standard_normal((n, 20)).astype(np.float32) for n in (17, 33, 40)
    ]
    outs = model.synthesize_batch(mels, bucket_size=16)
    for mel, out in zip(mels, outs):
        assert out.shape == (len(mel) * 16, 1)
        with torch.no_grad():
            ref_out = ref.inference(torch.from_numpy(mel)).numpy()
        # bucketed padding alters conv edge context only near the tail;
        # interior samples must match the unpadded reference exactly
        n_safe = out.shape[0] - 8 * 16  # generous receptive-field margin
        np.testing.assert_allclose(
            out[:n_safe], ref_out[:n_safe], rtol=1e-3, atol=1e-4
        )


def test_legacy_version_pqmf_defaults(tmp_path):
    """Checkpoints with config version <= 0.4.2 must get the old PQMF
    prototype defaults (taps 62, cutoff 0.15, beta 9.0 — reference
    utils/utils.py:350-357); newer versions the current defaults."""
    import parallel_wavegan.models as ref_models

    gen_params = {
        "in_channels": 20, "out_channels": 4, "channels": 64,
        "upsample_scales": [2, 2], "stacks": 2,
    }
    torch.manual_seed(2)
    ref = ref_models.MelGANGenerator(**gen_params)
    ref.eval()

    config = {
        "generator_type": "MelGANGenerator",
        "generator_params": gen_params,
        "hop_size": 16,
        "version": "0.4.2",
    }
    (tmp_path / "old").mkdir()
    path = _save_reference_ckpt(tmp_path / "old", ref, config)
    old = load_model(path)
    assert old.pqmf is not None and old.pqmf.cutoff_ratio == 0.15

    config = dict(config, version="0.5.3")
    (tmp_path / "new").mkdir()
    path = _save_reference_ckpt(tmp_path / "new", ref, config)
    new = load_model(path)
    assert new.pqmf is not None and new.pqmf.cutoff_ratio != 0.15


def test_chunked_synthesis_exact():
    """Overlap-chunked synthesis with receptive-field halos must be
    bit-equal to the full-utterance forward for deterministic generators
    (MelGAN / HiFiGAN), and length/finite for noise-driven PWG."""
    import jax
    import jax.numpy as jnp

    from parallelwavegan_tpu.utils.model_loader import InferenceModel

    rng = np.random.default_rng(0)
    T = 700  # not a multiple of chunk_frames -> exercises the tail window

    melgan_cfg = {
        "generator_type": "MelGANGenerator",
        "generator_params": {
            "in_channels": 16, "out_channels": 1, "channels": 32,
            "upsample_scales": [4, 4], "stacks": 2,
        },
        "hop_size": 16,
    }
    mel = rng.standard_normal((T, 16)).astype(np.float32)
    for cfg in (melgan_cfg,
                {**melgan_cfg,
                 "generator_params": {**melgan_cfg["generator_params"],
                                      "out_channels": 4},
                 "hop_size": 64},
                {"generator_type": "HiFiGANGenerator",
                 "generator_params": {
                     "in_channels": 16, "channels": 32,
                     "upsample_scales": [4, 4],
                     "upsample_kernel_sizes": [8, 8],
                     "resblock_kernel_sizes": [3],
                     "resblock_dilations": [[1, 3]],
                 },
                 "hop_size": 16}):
        from parallelwavegan_tpu.models import get_model_class

        gen_cls = get_model_class(cfg["generator_type"])
        gen = gen_cls(**cfg["generator_params"])
        variables = gen.init({"params": jax.random.key(0)},
                             jnp.zeros((1, 8, 16)))
        model = InferenceModel(cfg, variables, fold_norm=False)
        full = model.inference(mel)
        chunked = model.inference_chunked(
            mel, chunk_frames=128, context_frames=48
        )
        assert chunked.shape == full.shape
        np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-5)

    pwg_cfg = {
        "generator_type": "ParallelWaveGANGenerator",
        "generator_params": {
            "layers": 6, "stacks": 3, "residual_channels": 8,
            "gate_channels": 16, "skip_channels": 8, "aux_channels": 16,
            "aux_context_window": 2,
            "upsample_params": {"upsample_scales": [4, 4]},
        },
        "hop_size": 16,
    }
    from parallelwavegan_tpu.models import ParallelWaveGANGenerator

    gen = ParallelWaveGANGenerator(**pwg_cfg["generator_params"])
    variables = gen.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 8 * 16, 1)), jnp.zeros((1, 12, 16)),
    )
    model = InferenceModel(pwg_cfg, variables, fold_norm=False)
    chunked = model.inference_chunked(mel, chunk_frames=128,
                                      context_frames=48)
    assert chunked.shape == (T * 16, 1)
    assert np.isfinite(chunked).all()


def test_pcm16_on_device_output(tmp_path):
    """pcm16=True converts to int16 PCM on device (halving readback
    bytes); must match utils.io.write_wav's host-side conversion of the
    float output to <=1 LSB, and write_wav must pass the int16 array
    through bit-exactly."""
    import yaml

    from parallelwavegan_tpu.engine.build import init_train_state
    from parallelwavegan_tpu.engine.checkpoint import save_checkpoint
    from parallelwavegan_tpu.utils.io import write_wav
    from scipy.io import wavfile

    config = {
        "generator_type": "MelGANGenerator",
        "generator_params": {
            "in_channels": 16, "channels": 64, "upsample_scales": [8, 8],
            "stacks": 1,
        },
        "discriminator_type": "MelGANDiscriminator",
        "discriminator_params": {
            "channels": 8, "downsample_scales": [4],
            "max_downsample_channels": 32,
        },
        "hop_size": 64, "num_mels": 16, "batch_max_steps": 512,
        "sampling_rate": 16000,
    }
    import jax

    state, *_ = init_train_state(config, jax.random.key(0))
    ckpt = str(tmp_path / "checkpoint-0steps.ckpt")
    save_checkpoint(ckpt, state)
    with open(tmp_path / "config.yml", "w") as f:
        yaml.dump(config, f)

    mel = np.random.default_rng(0).standard_normal((40, 16)).astype(
        np.float32
    )
    m_f32 = load_model(ckpt, config)
    m_i16 = load_model(ckpt, config, pcm16=True)
    y = m_f32.inference(mel)
    y16 = m_i16.inference(mel)
    assert y16.dtype == np.int16 and y16.shape == y.shape

    # device conversion vs the host path write_wav applies to floats
    host16 = (np.clip(y.astype(np.float64), -1, 1)[:, 0] * 32767.0).astype(
        np.int16
    )
    assert np.abs(y16[:, 0].astype(np.int32) - host16.astype(np.int32)).max() <= 1

    # write_wav round-trips the int16 array bit-exactly
    wav_path = str(tmp_path / "x.wav")
    write_wav(wav_path, y16[:, 0], 16000)
    _, back = wavfile.read(wav_path)
    np.testing.assert_array_equal(back, y16[:, 0])


def test_chunked_synthesis_style_melgan():
    """StyleMelGAN chunked synthesis: the full noise grid is drawn once
    and sliced per chunk on noise-grid-aligned boundaries (pop-noise crop
    semantics of reference models/style_melgan.py:227-238 preserved).
    TADE instance-norm statistics are window-global, so chunked output is
    approximate, not bit-equal: assert a tight RMS-relative bound plus
    exactness of the single-window path."""
    import jax
    import jax.numpy as jnp

    from parallelwavegan_tpu.utils.model_loader import InferenceModel

    cfg = {
        "generator_type": "StyleMelGANGenerator",
        "generator_params": {
            "in_channels": 16, "aux_channels": 16, "channels": 16,
            "kernel_size": 9, "dilation": 2,
            "noise_upsample_scales": (4, 2, 2),
            "upsample_scales": (2, 2, 2, 2, 2, 2, 1),
        },
        "hop_size": 64,
    }
    from parallelwavegan_tpu.models import get_model_class

    gen = get_model_class(cfg["generator_type"])(**cfg["generator_params"])
    variables = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 16, 16)), jnp.zeros((1, 1, 16)),
    )
    model = InferenceModel(cfg, variables, fold_norm=False)
    rng = np.random.default_rng(0)
    for T in (700, 33):  # tail window + shorter-than-one-chunk utterance
        mel = rng.standard_normal((T, 16)).astype(np.float32)
        key = jax.random.key(7)
        full = model.synthesize_batch([mel], rng=key, bucket_size=1)[0]
        chunked = model.inference_chunked(
            mel, chunk_frames=128, context_frames=48, rng=key
        )
        assert chunked.shape == full.shape
        if T == 33:
            # single window == the full padded forward: exact
            np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-5)
        else:
            # multi-window: bounded by the instance-norm window-statistics
            # approximation; no seam discontinuities beyond the bound
            rms = float(np.sqrt(np.mean(full**2)))
            err = np.abs(chunked - full)
            assert err.max() <= 2e-2 * rms, (err.max(), rms)
            assert np.sqrt(np.mean(err**2)) <= 5e-3 * rms
