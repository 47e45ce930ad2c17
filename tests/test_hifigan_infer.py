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
    assert len(scales) == 2 * 2 * 2 * 2  # stages x branches x dils x convs
    assert all(s > 0 for s in scales.values())
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
