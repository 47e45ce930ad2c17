"""Parity tests for the fused Pallas MRF stage kernel (interpret mode).

The kernel (ops/pallas/mrf_stage.py) must reproduce the serving MRF math
exactly: (a) against its own XLA reference on one stage, (b) inside the
full hifigan_fast_forward against the existing qconv chain with identical
calibration scales, in both int8 and non-quantized modes, across chunk
boundaries (T not a multiple of chunk) and sequence edges.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.models import HiFiGANGenerator
from parallelwavegan_tpu.ops.hifigan_infer import (
    build_mrf_packs,
    calibrate,
    hifigan_fast_forward,
    supports_mrf_kernel,
)
from parallelwavegan_tpu.ops.pallas.mrf_stage import (
    build_stage_pack,
    mrf_stage,
    mrf_stage_reference,
)


def _rand_stage(rng, C, kernels, dils):
    weights = [
        [
            (
                rng.standard_normal((k, C, C)).astype(np.float32) * 0.2,
                rng.standard_normal(C).astype(np.float32) * 0.05,
            )
            for _ in range(len(dils) * 2)
        ]
        for k in kernels
    ]
    scales = [
        [
            np.abs(rng.standard_normal(C)).astype(np.float32) * 0.05 + 0.01
            for _ in range(len(dils) * 2)
        ]
        for _ in kernels
    ]
    return weights, scales


@pytest.mark.parametrize("quant", [False, True])
def test_stage_kernel_matches_reference(quant):
    rng = np.random.default_rng(0)
    C, T, B = 8, 300, 2  # T=300 with chunk=64: 5 chunks, ragged tail
    kernels, dils = (3, 5, 7), (1, 2)
    weights, scales = _rand_stage(rng, C, kernels, dils)
    pack = build_stage_pack(weights, scales, quant=quant, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    ref = mrf_stage_reference(x, pack, kernels=kernels, dils=dils,
                              quant=quant)
    out = mrf_stage(x, pack, kernels=kernels, dils=dils, chunk=64,
                    quant=quant, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5
    )


@pytest.fixture(scope="module")
def small_hifigan():
    gen = HiFiGANGenerator(
        in_channels=12, channels=32, kernel_size=7,
        upsample_scales=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3, 5, 7),
        resblock_dilations=((1, 3), (1, 3), (1, 3)),
    )
    rng = np.random.default_rng(1)
    c = jnp.asarray(rng.standard_normal((2, 40, 12)), jnp.float32)
    variables = gen.init(
        {"params": jax.random.key(0)}, c[:, :8].astype(jnp.float32)
    )
    return gen, variables, c


def test_supports_mrf_kernel(small_hifigan):
    gen, _, _ = small_hifigan
    assert supports_mrf_kernel(gen)
    causal = HiFiGANGenerator(use_causal_conv=True)
    assert not supports_mrf_kernel(causal)


def test_full_model_bf16_pack_matches_plain(small_hifigan):
    gen, variables, c = small_hifigan
    y_ref = hifigan_fast_forward(gen, variables, c)
    packs = build_mrf_packs(gen, variables, quant=False, dtype=jnp.float32)
    for p in packs.values():
        p["chunk"] = 32
    y_k = hifigan_fast_forward(
        gen, variables, c, mrf_packs=packs, mrf_interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(y_k), np.asarray(y_ref), atol=2e-6, rtol=1e-5
    )


def test_full_model_int8_pack_matches_qconv(small_hifigan):
    """Same calibration scales through the kernel and the XLA qconv chain
    must give the same waveform (identical quantization decisions)."""
    gen, variables, c = small_hifigan
    scales = calibrate(gen, variables, c)
    mrf_scales = {k: v for k, v in scales.items() if not k.endswith("_up")}
    y_q = hifigan_fast_forward(gen, variables, c, scales=mrf_scales)
    packs = build_mrf_packs(gen, variables, scales, quant=True)
    for p in packs.values():
        p["chunk"] = 32
    y_k = hifigan_fast_forward(
        gen, variables, c, mrf_packs=packs, mrf_interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(y_k), np.asarray(y_q), atol=2e-6, rtol=1e-5
    )


def test_partial_stage_selection(small_hifigan):
    """Stages not in the pack dict keep the XLA path (mixed execution)."""
    gen, variables, c = small_hifigan
    packs = build_mrf_packs(
        gen, variables, quant=False, dtype=jnp.float32, stages=[1]
    )
    assert list(packs.keys()) == [1]
    for p in packs.values():
        p["chunk"] = 32
    y_ref = hifigan_fast_forward(gen, variables, c)
    y_k = hifigan_fast_forward(
        gen, variables, c, mrf_packs=packs, mrf_interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(y_k), np.asarray(y_ref), atol=2e-6, rtol=1e-5
    )
