"""Smoke + parity tests for UHiFiGAN, VQVAE, and discrete-symbol variants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parallelwavegan_tpu.models import (
    DiscreteSymbolDurationGenerator,
    DiscreteSymbolF0Generator,
    DiscreteSymbolHiFiGANGenerator,
    DiscreteSymbolStyleMelGANGenerator,
    UHiFiGANGenerator,
    VQVAE,
)

SMALL_UHIFI = dict(
    in_channels=20, channels=16, downsample_scales=(4, 2),
    downsample_kernel_sizes=(8, 4), upsample_scales=(2, 4),
    upsample_kernel_sizes=(4, 8), resblock_kernel_sizes=(3,),
    resblock_dilations=((1, 3),),
)


def test_uhifigan_shapes():
    m = UHiFiGANGenerator(**SMALL_UHIFI)
    T = 256
    c = jnp.zeros((2, T // 8, 20))
    exc = jnp.zeros((2, T, 1))
    var = m.init({"params": jax.random.key(0)}, c, None, exc)
    y = m.apply(var, c, None, exc)
    assert y.shape == (2, T, 1)


def test_import_unknown_model_raises():
    """Unknown model names must fail loudly in the importer. (Golden parity
    for UHiFiGAN/VQVAE/discrete families lives in test_discrete_parity.py.)"""
    from parallelwavegan_tpu.utils.torch_import import import_model_params

    with pytest.raises(KeyError):
        import_model_params({}, "NotAModel")


def test_vqvae_roundtrip():
    m = VQVAE(
        num_embeds=32, embed_dim=16,
        encoder_conf={"out_channels": 16, "downsample_scales": [4, 4],
                      "channels": 8, "max_downsample_channels": 32},
        decoder_conf={"in_channels": 16, "upsample_scales": [4, 4],
                      "channels": 32, "stacks": 2},
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1024, 1)),
        dtype=jnp.float32,
    )
    var = m.init({"params": jax.random.key(0)}, x)
    x_bar, z_e, z_q = m.apply(var, x)
    assert x_bar.shape == (2, 1024, 1)
    assert z_e.shape == z_q.shape
    idx = m.apply(var, x, method="encode")
    assert idx.shape == z_e.shape[:2]
    y = m.apply(var, idx, method="decode")
    assert y.shape == (2, 1024, 1)


def test_vqvae_global_local_conditioning():
    m = VQVAE(
        num_embeds=32, embed_dim=16,
        num_global_embeds=4, global_embed_dim=8,
        encoder_conf={"out_channels": 16, "downsample_scales": [4, 4],
                      "channels": 8, "max_downsample_channels": 32},
        decoder_conf={"in_channels": 24, "upsample_scales": [4, 4],
                      "channels": 32, "stacks": 2},
    )
    x = jnp.zeros((2, 1024, 1))
    g = jnp.asarray([0, 3])
    var = m.init({"params": jax.random.key(0)}, x, None, g)
    x_bar, _, _ = m.apply(var, x, None, g)
    assert x_bar.shape == (2, 1024, 1)


DISC_TRUNK = dict(
    in_channels=16, channels=32, upsample_scales=(4, 2),
    upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
    resblock_dilations=((1, 3),), num_embs=10, num_spk_embs=4,
    spk_emb_dim=16,
)


def test_discrete_hifigan_generator():
    m = DiscreteSymbolHiFiGANGenerator(**DISC_TRUNK)
    c = jnp.zeros((2, 32, 2), jnp.int32)
    var = m.init({"params": jax.random.key(0)}, c)
    y = m.apply(var, c)
    assert y.shape == (2, 32 * 8, 1)


def test_discrete_hifigan_no_spk():
    m = DiscreteSymbolHiFiGANGenerator(**{**DISC_TRUNK, "num_spk_embs": 0})
    c = jnp.zeros((2, 32, 1), jnp.int32)
    var = m.init({"params": jax.random.key(0)}, c)
    assert m.apply(var, c).shape == (2, 256, 1)


def test_discrete_duration_generator():
    m = DiscreteSymbolDurationGenerator(**DISC_TRUNK, max_reg_len=64)
    c = jnp.zeros((2, 16, 2), jnp.int32)
    ds = jnp.ones((2, 16), jnp.int32) * 2
    var = m.init({"params": jax.random.key(0)}, c, ds)
    y, ds_out = m.apply(var, c, ds)
    assert y.shape == (2, 64 * 8, 1)
    assert ds_out.shape == (2, 16)
    # synthesis path (predicted durations)
    y2, _ = m.apply(var, c, None)
    assert y2.shape == (2, 64 * 8, 1)


def test_discrete_f0_generator_weight_sum():
    m = DiscreteSymbolF0Generator(
        **{**DISC_TRUNK, "num_spk_embs": 0}, linear_channel=8,
        use_weight_sum=True, layer_num=3,
    )
    c = jnp.zeros((2, 32, 3), jnp.int32)
    f0 = jnp.ones((2, 32, 1))
    var = m.init({"params": jax.random.key(0)}, c, f0)
    y = m.apply(var, c, f0)
    assert y.shape == (2, 256, 1)
    assert var["params"]["weights"].shape == (3,)


def test_discrete_style_melgan_generator():
    m = DiscreteSymbolStyleMelGANGenerator(
        in_channels=16, aux_channels=16, channels=16, num_embs=10,
        num_spk_embs=4, spk_emb_dim=16,
        noise_upsample_scales=(4, 2), upsample_scales=(2, 2, 1),
    )
    c = jnp.zeros((2, 8, 2), jnp.int32)
    var = m.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, c)
    y = m.apply(var, c, rngs={"noise": jax.random.key(2)})
    assert y.shape == (2, 32, 1)
