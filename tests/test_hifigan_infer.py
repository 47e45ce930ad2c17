"""HiFiGAN fast-serving path: exactness vs the flax module + int8 sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.models import HiFiGANGenerator
from parallelwavegan_tpu.ops.hifigan_infer import (
    calibrate,
    hifigan_fast_forward,
    supports_fast_inference,
)


@pytest.fixture(scope="module")
def small_gen():
    gen = HiFiGANGenerator(
        in_channels=20,
        channels=64,
        upsample_scales=(4, 4),
        upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3, 7),
        resblock_dilations=((1, 3), (1, 3)),
    )
    c = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 24, 20)), jnp.float32
    )
    variables = gen.init({"params": jax.random.key(0)}, c)
    return gen, variables, c


def test_fast_forward_matches_flax(small_gen):
    gen, variables, c = small_gen
    assert supports_fast_inference(gen)
    ref = gen.apply(variables, c)
    got = hifigan_fast_forward(gen, variables, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fast_forward_matches_flax_nondefault_slope(small_gen):
    gen0, _, c = small_gen
    gen = gen0.copy(nonlinear_activation_params={"negative_slope": 0.2})
    variables = gen.init({"params": jax.random.key(1)}, c)
    ref = gen.apply(variables, c)
    got = hifigan_fast_forward(gen, variables, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_path_close_to_f32(small_gen):
    """Static-scale int8 MRF must track the f32 output closely on the
    calibration distribution (random init, tanh-bounded outputs)."""
    gen, variables, c = small_gen
    scales = calibrate(gen, variables, c)
    # stages x branches x dils x convs (16) + one deconv per stage (2)
    assert len(scales) == 2 * 2 * 2 * 2 + 2
    # per-input-channel scale vectors, all strictly positive
    assert all(np.all(np.asarray(s) > 0) for s in scales.values())
    ref = np.asarray(gen.apply(variables, c))
    got = np.asarray(hifigan_fast_forward(gen, variables, c, scales=scales))
    err = np.abs(got - ref)
    snr = 10 * np.log10(
        (ref.astype(np.float64) ** 2).mean() / max((err ** 2).mean(), 1e-20)
    )
    assert snr > 30, snr


def test_int8_no_additional_convs():
    gen = HiFiGANGenerator(
        in_channels=10,
        channels=32,
        upsample_scales=(4,),
        upsample_kernel_sizes=(8,),
        resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
        use_additional_convs=False,
    )
    c = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 16, 10)), jnp.float32
    )
    variables = gen.init({"params": jax.random.key(2)}, c)
    ref = np.asarray(gen.apply(variables, c))
    got = np.asarray(hifigan_fast_forward(gen, variables, c))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    scales = calibrate(gen, variables, c)
    got8 = np.asarray(hifigan_fast_forward(gen, variables, c, scales=scales))
    assert np.isfinite(got8).all()


def test_inference_model_int8_serving(small_gen):
    """The product surface for int8: InferenceModel.quantize_int8 (the
    engine behind `decode --int8`) must produce waveforms close to the
    full-precision path and re-use the serving jit cache correctly."""
    gen, variables, c = small_gen
    from parallelwavegan_tpu.utils.model_loader import InferenceModel

    config = {
        "generator_type": "HiFiGANGenerator",
        "generator_params": {
            "in_channels": 20, "channels": 64,
            "upsample_scales": [4, 4], "upsample_kernel_sizes": [8, 8],
            "resblock_kernel_sizes": [3, 7],
            "resblock_dilations": [[1, 3], [1, 3]],
            "use_weight_norm": True,
        },
        "sampling_rate": 16000,
        "hop_size": 16,
    }
    model = InferenceModel(config, jax.device_get(variables))
    mels = [np.asarray(c[0, :20]), np.asarray(c[1, :24])]
    ref = model.synthesize_batch(mels)
    # 'all' exercises every quantized conv; the 'auto' product default
    # keeps this small test model's C<128 MRF stages bf16 (covered below)
    model.quantize_int8(mels, schedule="all")
    events_after_calib = model.compile_events
    got = model.synthesize_batch(mels)
    assert model.compile_events == events_after_calib + 1  # one new jit
    got2 = model.synthesize_batch(mels)  # warm: no recompile
    assert model.compile_events == events_after_calib + 1
    for r, g, g2 in zip(ref, got, got2):
        assert r.shape == g.shape
        np.testing.assert_array_equal(g, g2)
        err = np.abs(g - r)
        snr = 10 * np.log10(
            (r.astype(np.float64) ** 2).mean() + 1e-20
        ) - 10 * np.log10((err.astype(np.float64) ** 2).mean() + 1e-20)
        assert snr > 25, snr


def test_int8_schedule_filter(small_gen):
    """'auto' keeps the C>=128 MRF stages + every deconv; 'all' keeps
    everything. On the small test model (channels=64 -> stage widths
    32/16) 'auto' must quantize only the deconvs, and the auto-scheduled
    model must still synthesize (bf16 fallback per absent key)."""
    gen, variables, c = small_gen
    from parallelwavegan_tpu.ops.hifigan_infer import (
        calibrate,
        filter_scales_schedule,
    )
    from parallelwavegan_tpu.utils.model_loader import InferenceModel

    scales = calibrate(gen, variables, c)
    auto = filter_scales_schedule(scales, gen, "auto")
    assert set(auto) == {k for k in scales if k.endswith("_up")}
    assert filter_scales_schedule(scales, gen, "all") is scales

    config = {
        "generator_type": "HiFiGANGenerator",
        "generator_params": {
            "in_channels": 20, "channels": 64,
            "upsample_scales": [4, 4], "upsample_kernel_sizes": [8, 8],
            "resblock_kernel_sizes": [3, 7],
            "resblock_dilations": [[1, 3], [1, 3]],
            "use_weight_norm": True,
        },
        "sampling_rate": 16000,
        "hop_size": 16,
    }
    import jax

    model = InferenceModel(config, jax.device_get(variables))
    mels = [np.asarray(c[0, :20])]
    ref = model.synthesize_batch(mels)[0]
    model.quantize_int8(mels)  # product default = auto
    got = model.synthesize_batch(mels)[0]
    assert got.shape == ref.shape
    err = np.abs(got - ref)
    snr = 10 * np.log10((ref.astype(np.float64) ** 2).mean() + 1e-20) \
        - 10 * np.log10((err.astype(np.float64) ** 2).mean() + 1e-20)
    assert snr > 25, snr


def test_inference_model_int8_rejects_unsupported():
    from parallelwavegan_tpu.utils.model_loader import InferenceModel

    config = {
        "generator_type": "MelGANGenerator",
        "generator_params": {"in_channels": 10, "out_channels": 1,
                             "channels": 16, "upsample_scales": [4, 4],
                             "stacks": 1, "kernel_size": 3},
        "sampling_rate": 16000,
    }
    from parallelwavegan_tpu.models import get_model_class

    g = get_model_class("MelGANGenerator")(
        **{k: tuple(v) if isinstance(v, list) else v
           for k, v in config["generator_params"].items()}
    )
    import jax as _jax

    v = g.init({"params": _jax.random.key(0)},
               jnp.zeros((1, 8, 10), jnp.float32))
    model = InferenceModel(config, _jax.device_get(v))
    with pytest.raises(ValueError):
        model.quantize_int8([np.zeros((8, 10), np.float32)])


def test_int8_conv_core_accumulates_in_int32():
    """Regression for the int8 accumulator wrap: an int8xint8 conv WITHOUT
    preferred_element_type=int32 wraps mod 256 (XLA output dtype follows
    input dtype). The quantized conv core must track the f32 conv at the
    CONV level — the end-to-end SNR test alone missed this because
    random-init MRF branches barely contribute to the output."""
    from parallelwavegan_tpu.ops.conv import conv1d

    rng = np.random.default_rng(0)
    # trained-like stats: per-channel spreads over orders of magnitude
    chan_scale = np.exp(rng.uniform(-3, 1, 64))
    x = jnp.asarray(
        rng.standard_normal((2, 128, 64)) * chan_scale, jnp.float32
    )
    w = jnp.asarray(rng.standard_normal((3, 64, 64)) * 0.2, jnp.float32)
    ref = np.asarray(conv1d(x, w, None, padding=1))

    sx = jnp.asarray(
        np.maximum(np.abs(np.asarray(x)).max(axis=(0, 1)), 1e-8) / 127.0,
        jnp.float32,
    )
    from parallelwavegan_tpu.ops.hifigan_infer import _quant_w, _quant_x

    wq, sw = _quant_w(w * sx.reshape(1, -1, 1))
    xq = _quant_x(x, sx)
    y = conv1d(xq, wq, None, padding=1,
               preferred_element_type=jnp.int32)
    got = np.asarray(y, np.float32) * np.asarray(sw)
    err = got - ref
    snr = 10 * np.log10(
        (ref.astype(np.float64) ** 2).mean() / max((err**2).mean(), 1e-20)
    )
    assert snr > 35, snr
    # and the wrap really happens without the accumulator type (guards
    # against silently relying on a backend that upcasts anyway)
    wrapped = np.asarray(conv1d(xq, wq, None, padding=1), np.float32)
    assert np.abs(wrapped).max() <= 128  # int8 range: mod-256 wrap
