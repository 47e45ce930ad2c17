"""Layer library tests: shapes, causality, init schemes, weight-norm folding.

Mirrors the reference's test strategy (test/test_layers.py): causality via
second-half perturbation, upsampling length arithmetic, init distributions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu import layers as L
from parallelwavegan_tpu.utils import fold_weight_norm


def _init_and_apply(module, *args, rngs=None, **kwargs):
    rngs = rngs or {"params": jax.random.key(0)}
    variables = module.init(rngs, *args, **kwargs)
    out = module.apply(variables, *args, **kwargs)
    return variables, out


def test_conv1d_torch_padding_semantics():
    x = jnp.ones((2, 100, 16))
    m = L.Conv1d(features=24, kernel_size=5, padding=2, dilation=1)
    _, y = _init_and_apply(m, x)
    assert y.shape == (2, 100, 24)
    m = L.Conv1d(features=24, kernel_size=5, padding=4, dilation=2)
    _, y = _init_and_apply(m, x)
    assert y.shape == (2, 100, 24)
    m = L.Conv1d(features=24, kernel_size=41, stride=4, padding=20, groups=4)
    _, y = _init_and_apply(m, x)
    assert y.shape == (2, 25, 24)


def test_conv_transpose1d_matches_torch_length():
    torch = pytest.importorskip("torch")
    for (k, s, p, op) in [(16, 8, 4, 0), (4, 2, 1, 0), (10, 5, 3, 1), (9, 3, 3, 0)]:
        x = np.random.default_rng(0).standard_normal((2, 50, 6)).astype(np.float32)
        m = L.ConvTranspose1d(features=8, kernel_size=k, stride=s, padding=p,
                              output_padding=op)
        var, y = _init_and_apply(m, jnp.asarray(x))
        tref = torch.nn.ConvTranspose1d(6, 8, k, s, padding=p, output_padding=op)
        assert y.shape[1] == tref(torch.zeros(2, 6, 50)).shape[2]


def test_conv_transpose1d_matches_torch_values():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 20, 3)).astype(np.float32)
    w = rng.standard_normal((3, 5, 8)).astype(np.float32)  # (in, out, k)
    b = rng.standard_normal(5).astype(np.float32)
    with torch.no_grad():
        tc = torch.nn.ConvTranspose1d(3, 5, 8, 4, padding=2, output_padding=0)
        tc.weight.copy_(torch.from_numpy(w))
        tc.bias.copy_(torch.from_numpy(b))
        ref = tc(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    # our kernel layout: (K, Cin, Cout) in forward orientation == torch
    # ConvTranspose weight (Cin, Cout, K) transposed (no flip)
    kernel = jnp.asarray(w.transpose(2, 0, 1))
    from parallelwavegan_tpu.ops.conv import conv_transpose1d

    y = conv_transpose1d(
        jnp.asarray(x), kernel, jnp.asarray(b), stride=4, padding=2
    )
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5
    )


def test_causal_conv1d_is_causal():
    x1 = np.random.default_rng(2).standard_normal((1, 64, 8)).astype(np.float32)
    x2 = x1.copy()
    x2[:, 32:, :] += 1.0
    m = L.CausalConv1d(features=8, kernel_size=5, dilation=2)
    var = m.init({"params": jax.random.key(0)}, jnp.asarray(x1))
    y1 = m.apply(var, jnp.asarray(x1))
    y2 = m.apply(var, jnp.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y1)[:, :32], np.asarray(y2)[:, :32])
    assert y1.shape == (1, 64, 8)


def test_causal_conv_transpose1d_shape_and_causality():
    s = 4
    x1 = np.random.default_rng(3).standard_normal((1, 32, 8)).astype(np.float32)
    x2 = x1.copy()
    x2[:, 16:, :] += 1.0
    m = L.CausalConvTranspose1d(features=4, kernel_size=2 * s, stride=s)
    var = m.init({"params": jax.random.key(0)}, jnp.asarray(x1))
    y1 = m.apply(var, jnp.asarray(x1))
    y2 = m.apply(var, jnp.asarray(x2))
    assert y1.shape == (1, 32 * s, 4)
    np.testing.assert_array_equal(
        np.asarray(y1)[:, : 16 * s], np.asarray(y2)[:, : 16 * s]
    )


def test_wavenet_residual_block():
    x = jnp.zeros((2, 64, 16))
    c = jnp.zeros((2, 64, 80))
    m = L.WaveNetResidualBlock(
        residual_channels=16, gate_channels=32, skip_channels=8, aux_channels=80
    )
    _, (res, skip) = _init_and_apply(m, x, c)
    assert res.shape == (2, 64, 16) and skip.shape == (2, 64, 8)


def test_hifigan_residual_block():
    x = jnp.zeros((2, 64, 32))
    m = L.HiFiGANResidualBlock(channels=32, dilations=(1, 3, 5))
    _, y = _init_and_apply(m, x)
    assert y.shape == x.shape


def test_residual_stack():
    x = jnp.zeros((2, 64, 32))
    m = L.ResidualStack(channels=32, dilation=3)
    _, y = _init_and_apply(m, x)
    assert y.shape == x.shape


def test_upsample_network_length():
    scales = [4, 4, 4, 4]
    c = jnp.zeros((2, 20, 80))
    m = L.UpsampleNetwork(upsample_scales=scales)
    _, y = _init_and_apply(m, c)
    assert y.shape == (2, 20 * 256, 80)


def test_conv_in_upsample_network_length():
    scales = [4, 4, 4, 4]
    ctx = 2
    c = jnp.zeros((2, 20 + 2 * ctx, 80))
    m = L.ConvInUpsampleNetwork(upsample_scales=scales, aux_context_window=ctx)
    _, y = _init_and_apply(m, c)
    assert y.shape == (2, 20 * 256, 80)


def test_tade_res_block():
    x = jnp.zeros((2, 32, 64))
    c = jnp.zeros((2, 32, 80))
    m = L.TADEResBlock(in_channels=64, aux_channels=80, upsample_factor=2)
    _, (y, c2) = _init_and_apply(m, x, c)
    assert y.shape == (2, 64, 64) and c2.shape == (2, 64, 64)


def test_vq_codebook_straight_through():
    m = L.VQCodebook(num_embeddings=16, embedding_dim=8)
    z = jnp.asarray(np.random.default_rng(4).standard_normal((2, 10, 8)),
                    dtype=jnp.float32)
    var = m.init({"params": jax.random.key(0)}, z)
    idx = m.apply(var, z)
    assert idx.shape == (2, 10) and idx.dtype == jnp.int32
    z_st, z_q = m.apply(var, z, method="straight_through")
    assert z_st.shape == z.shape and z_q.shape == z.shape
    # STE passes gradient through to z
    g = jax.grad(
        lambda zz: jnp.sum(m.apply(var, zz, method="straight_through")[0])
    )(z)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_length_regulator():
    from parallelwavegan_tpu.layers import length_regulator, length_regulator_np

    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    d = jnp.asarray([[2, 0, 1, 3]])
    y, mask = length_regulator(x, d, max_len=8)
    ref = length_regulator_np(np.asarray(x[0]), np.asarray(d[0]))
    np.testing.assert_array_equal(np.asarray(y[0])[:6], ref)
    np.testing.assert_array_equal(np.asarray(mask[0]), [1, 1, 1, 1, 1, 1, 0, 0])
    # all-zero durations fall back to ones
    y0, mask0 = length_regulator(x, jnp.zeros((1, 4), jnp.int32), max_len=8)
    np.testing.assert_array_equal(np.asarray(y0[0])[:4], np.asarray(x[0]))


def test_weight_norm_fold_identity():
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 50, 8)), dtype=jnp.float32
    )
    m_wn = L.Conv1d(features=16, kernel_size=3, padding=1, use_weight_norm=True)
    var = m_wn.init({"params": jax.random.key(7)}, x)
    y_wn = m_wn.apply(var, x)
    m_plain = L.Conv1d(features=16, kernel_size=3, padding=1)
    folded = {"params": fold_weight_norm(var["params"])}
    y_folded = m_plain.apply(folded, x)
    np.testing.assert_allclose(
        np.asarray(y_wn), np.asarray(y_folded), rtol=1e-5, atol=1e-6
    )


def test_weight_norm_initial_kernel_matches_base_init():
    # g is initialized to ||v||, so the effective kernel == v at init
    x = jnp.zeros((1, 10, 4))
    m = L.Conv1d(features=6, kernel_size=3, padding=1, use_weight_norm=True)
    var = m.init({"params": jax.random.key(1)}, x)
    p = var["params"]
    v = np.asarray(p["kernel_v"])
    g = np.asarray(p["kernel_g"])
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    np.testing.assert_allclose(g, norm, rtol=1e-6)


def test_spectral_norm_scales_kernel():
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, 64, 4)), dtype=jnp.float32
    )
    m = L.Conv1d(features=8, kernel_size=5, padding=2, use_spectral_norm=True)
    var = m.init({"params": jax.random.key(2)}, x)
    assert "spectral" in var
    y, updated = m.apply(var, x, False, mutable=["spectral"])
    assert y.shape == (1, 64, 8)
    # u vector should be updated in training mode
    assert not np.allclose(
        np.asarray(var["spectral"]["u"]), np.asarray(updated["spectral"]["u"])
    )


def test_kaiming_init_std():
    x = jnp.zeros((1, 10, 64))
    m = L.Conv1d(
        features=256, kernel_size=3, padding=1,
        kernel_init=L.kaiming_normal_relu_init,
    )
    var = m.init({"params": jax.random.key(3)}, x)
    w = np.asarray(var["params"]["kernel"])
    expected = np.sqrt(2.0 / (64 * 3))
    assert abs(w.std() - expected) / expected < 0.1


def test_instance_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(7).standard_normal((2, 50, 6)).astype(np.float32)
    ours = np.asarray(L.instance_norm_1d(jnp.asarray(x)))
    ref = torch.nn.InstanceNorm1d(6)(
        torch.from_numpy(x.transpose(0, 2, 1))
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
