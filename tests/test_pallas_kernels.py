"""Pallas kernel parity tests (interpret mode on CPU).

The fused WaveNet-stack kernel (ops/pallas/wavenet_stack.py) must match the
per-layer flax forward exactly: same math, chunked with halos. These tests
run the kernel in interpreter mode against (a) the XLA reference path of
identical math and (b) the real ParallelWaveGANGenerator module.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.models import ParallelWaveGANGenerator
from parallelwavegan_tpu.ops.pallas.pwg_infer import (
    pwg_fused_forward,
    supports_fused_inference,
)
from parallelwavegan_tpu.ops.pallas.wavenet_stack import (
    wavenet_stack,
    wavenet_stack_reference,
)


def _random_stack_params(rng, L, R, G, A, S):
    return {
        "w_tap": jnp.asarray(rng.standard_normal((L, 3, R, G)) * 0.1, jnp.float32),
        "b_tap": jnp.asarray(rng.standard_normal((L, G)) * 0.1, jnp.float32),
        "w_aux": jnp.asarray(rng.standard_normal((L, A, G)) * 0.1, jnp.float32),
        "w_so": jnp.asarray(rng.standard_normal((L, R, S + R)) * 0.1, jnp.float32),
        "b_so": jnp.asarray(rng.standard_normal((L, S + R)) * 0.1, jnp.float32),
    }


@pytest.mark.parametrize("T", [1000, 1024])
def test_wavenet_stack_kernel_matches_reference(T):
    rng = np.random.default_rng(0)
    L, R, G, A, S = 6, 64, 128, 80, 64
    dils = (1, 2, 4, 1, 2, 4)
    w = _random_stack_params(rng, L, R, G, A, S)
    x = jnp.asarray(rng.standard_normal((2, T, R)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((2, T, A)), jnp.float32)
    xo_ref, sk_ref = wavenet_stack_reference(x, c, w, dils)
    # chunk < T exercises the halo'd chunking path
    xo, sk = wavenet_stack(x, c, w, dils, chunk=256, interpret=True)
    np.testing.assert_allclose(xo, xo_ref, atol=2e-5)
    np.testing.assert_allclose(sk, sk_ref, atol=2e-4)


def test_pwg_fused_forward_matches_flax_model():
    g = ParallelWaveGANGenerator(
        layers=12, stacks=2, residual_channels=16, gate_channels=32,
        skip_channels=16, aux_channels=20, aux_context_window=2,
        upsample_params={"upsample_scales": [2, 2]},
    )
    assert supports_fused_inference(g)
    rng = jax.random.key(0)
    B, Tf = 2, 40
    nprng = np.random.default_rng(0)
    c = jnp.asarray(nprng.standard_normal((B, Tf + 4, 20)), jnp.float32)
    z = jnp.asarray(nprng.standard_normal((B, Tf * 4, 1)), jnp.float32)
    v = g.init({"params": rng}, z, c)
    y_ref = g.apply(v, z, c)
    y_xla = pwg_fused_forward(g, v, z, c, use_kernel=False)
    np.testing.assert_allclose(y_xla, y_ref, atol=1e-4)
    y_pl = pwg_fused_forward(g, v, z, c, use_kernel=True, chunk=64,
                             interpret=True)
    np.testing.assert_allclose(y_pl, y_ref, atol=1e-4)


def test_wavenet_stack_train_grads_match_reference():
    from parallelwavegan_tpu.ops.pallas.wavenet_stack_train import (
        wavenet_stack_train,
    )

    rng = np.random.default_rng(1)
    L, R, G, A, S = 4, 16, 32, 12, 16
    dils = (1, 2, 4, 1)
    B, T, chunk = 2, 300, 128
    w = _random_stack_params(rng, L, R, G, A, S)
    x = jnp.asarray(rng.standard_normal((B, T, R)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, T, A)), jnp.float32)
    # random output weighting exercises both outputs' cotangents
    ux = jnp.asarray(rng.standard_normal((B, T, R)), jnp.float32)
    us = jnp.asarray(rng.standard_normal((B, T, S)), jnp.float32)

    def loss(fn):
        def f(x, c, w):
            xo, sk = fn(x, c, w)
            return jnp.sum(xo * ux) + jnp.sum(sk * us)
        return f

    ref = loss(lambda x, c, w: wavenet_stack_reference(x, c, w, dils))
    ker = loss(
        lambda x, c, w: wavenet_stack_train(x, c, w, dils, chunk, True)
    )
    v_ref, g_ref = jax.value_and_grad(ref, argnums=(0, 1, 2))(x, c, w)
    v_ker, g_ker = jax.value_and_grad(ker, argnums=(0, 1, 2))(x, c, w)
    np.testing.assert_allclose(v_ker, v_ref, rtol=1e-5)
    for a, b, name in [
        (g_ker[0], g_ref[0], "dx"),
        (g_ker[1], g_ref[1], "dc"),
    ]:
        np.testing.assert_allclose(a, b, atol=3e-4, err_msg=name)
    for k in g_ref[2]:
        np.testing.assert_allclose(
            g_ker[2][k], g_ref[2][k], atol=3e-3, err_msg=k
        )


def test_pwg_fused_train_forward_grads_match_flax():
    from parallelwavegan_tpu.ops.pallas.pwg_infer import pwg_fused_forward

    g = ParallelWaveGANGenerator(
        layers=6, stacks=2, residual_channels=16, gate_channels=32,
        skip_channels=16, aux_channels=20, aux_context_window=2,
        upsample_params={"upsample_scales": [2, 2]},
    )
    rng = jax.random.key(0)
    B, Tf = 2, 30
    nprng = np.random.default_rng(0)
    c = jnp.asarray(nprng.standard_normal((B, Tf + 4, 20)), jnp.float32)
    z = jnp.asarray(nprng.standard_normal((B, Tf * 4, 1)), jnp.float32)
    v = g.init({"params": rng}, z, c)
    u = jnp.asarray(nprng.standard_normal((B, Tf * 4, 1)), jnp.float32)

    def loss_flax(v):
        return jnp.sum(g.apply(v, z, c) * u)

    def loss_fused(v):
        y = pwg_fused_forward(g, v, z, c, trainable=True, chunk=64,
                              interpret=True)
        return jnp.sum(y * u)

    v_ref, g_ref = jax.value_and_grad(loss_flax)(v)
    v_fus, g_fus = jax.value_and_grad(loss_fused)(v)
    np.testing.assert_allclose(v_fus, v_ref, rtol=1e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fus = dict(jax.tree_util.tree_leaves_with_path(g_fus))
    assert len(flat_ref) == len(flat_fus)
    for path, a in flat_ref:
        b = flat_fus[path]
        np.testing.assert_allclose(
            b, a, atol=5e-3, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_path_rejects_unsupported_configs():
    g = ParallelWaveGANGenerator(kernel_size=5)
    assert not supports_fused_inference(g)
    g = ParallelWaveGANGenerator(use_causal_conv=True)
    assert not supports_fused_inference(g)


def test_fused_kernel_under_shard_map_mesh():
    """The fused WaveNet kernel must run inside the shard_map multi-chip
    train path (per-device programs; GSPMD would exclude pallas_call) and
    match the XLA forward's losses on the same sharded step."""
    import parallelwavegan_tpu.ops.pallas.pwg_infer as pwg_infer
    from parallelwavegan_tpu.engine.build import (
        example_batch,
        init_train_state,
    )
    from parallelwavegan_tpu.engine.criterion import build_criterion
    from parallelwavegan_tpu.engine.step import build_steps
    from parallelwavegan_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_batch,
    )

    config = {
        "sampling_rate": 16000,
        "hop_size": 16,
        "num_mels": 10,
        "batch_max_steps": 256,
        "batch_size": 8,
        "lambda_adv": 1.0,
        "generator_type": "ParallelWaveGANGenerator",
        "generator_params": {
            "layers": 4, "stacks": 2, "residual_channels": 8,
            "gate_channels": 16, "skip_channels": 8, "aux_channels": 10,
            "aux_context_window": 1,
            "upsample_params": {"upsample_scales": [4, 4]},
        },
        "discriminator_type": "ParallelWaveGANDiscriminator",
        "discriminator_params": {"layers": 3, "conv_channels": 8},
        "stft_loss_params": {
            "fft_sizes": [64], "hop_sizes": [16], "win_lengths": [48],
        },
        "generator_optimizer_params": {"lr": 1e-4},
        "discriminator_optimizer_params": {"lr": 1e-4},
        "generator_scheduler_params": {"step_size": 100, "gamma": 0.5},
        "discriminator_scheduler_params": {"step_size": 100, "gamma": 0.5},
        "generator_grad_norm": 10,
        "discriminator_grad_norm": 1,
    }
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces the 8-device CPU mesh

    rng = jax.random.key(0)
    state, g, d, og, od = init_train_state(config, rng)
    # the jitted steps donate their state argument; replicate from a host
    # snapshot so each step gets an independent copy
    state = jax.device_get(state)
    criterion = build_criterion(config)
    batch = example_batch(config, batch_size=8)

    calls = []
    orig = pwg_infer.pwg_fused_forward

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    pwg_infer.pwg_fused_forward = spy
    try:
        factory, _ = build_steps(
            {**config, "fused_wavenet": True,
             "fused_wavenet_interpret": True},
            g, d, criterion, og, od, mesh=mesh,
        )
        step = factory(True, True, True)
        _, metrics = step(
            replicate(mesh, state), shard_batch(mesh, batch), rng
        )
    finally:
        pwg_infer.pwg_fused_forward = orig
    assert calls, "fused Pallas path was not taken under shard_map"

    factory2, _ = build_steps(
        {**config, "fused_wavenet": False}, g, d, criterion, og, od,
        mesh=mesh,
    )
    step2 = factory2(True, True, True)
    _, metrics2 = step2(
        replicate(mesh, state), shard_batch(mesh, batch), rng
    )
    assert set(metrics) == set(metrics2)
    for k in metrics:
        np.testing.assert_allclose(
            np.asarray(metrics[k]), np.asarray(metrics2[k]),
            rtol=1e-4, atol=1e-4, err_msg=k,
        )
