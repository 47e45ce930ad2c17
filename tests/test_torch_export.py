"""Round-trip export: our randomly initialized generators -> torch
state_dict -> reference model forward must match our forward.

This is the inverse of tests/test_model_parity.py (which imports torch
weights into us); together they prove the converter is bijective on the
generator families users exchange with the reference toolkit / ESPnet.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.utils.torch_export import (
    export_generator_state_dict,
    save_reference_checkpoint,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module", autouse=True)
def _ref():
    from tests.reference_oracle import import_reference

    import_reference()


def _export_and_load(name, gen_params):
    """Init ours, export, strict-load into the reference torch model."""
    import parallel_wavegan.models as ref_models

    ours = get_model_class(name)(**gen_params)
    rng = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    frames = 16
    if name == "StyleMelGANGenerator":
        nf = ours.noise_upsample_factor
        c = jnp.zeros((1, nf, gen_params["aux_channels"]))
        z = jnp.zeros((1, 1, gen_params["in_channels"]))
        variables = ours.init(rng, c, z)
    elif name == "ParallelWaveGANGenerator":
        hop = int(np.prod(gen_params["upsample_params"]["upsample_scales"]))
        ctx = gen_params.get("aux_context_window", 2)
        c = jnp.zeros((1, frames + 2 * ctx, gen_params["aux_channels"]))
        z = jnp.zeros((1, frames * hop, 1))
        variables = ours.init(rng, z, c)
    else:
        c = jnp.zeros((1, frames, gen_params["in_channels"]))
        variables = ours.init(rng, c)

    state = export_generator_state_dict(
        variables["params"], name, {"generator_params": gen_params}
    )
    ref = getattr(ref_models, name)(**gen_params)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in state.items()}, strict=True
    )
    assert not missing and not unexpected
    ref.eval()
    return ours, variables, ref


def _assert_close(ours_out, ref_out):
    np.testing.assert_allclose(
        np.asarray(ours_out).transpose(0, 2, 1),
        ref_out.detach().numpy(),
        rtol=1e-4,
        atol=1e-5,
    )


def test_export_pwg_generator():
    gen_params = dict(
        layers=6, stacks=3, residual_channels=16, gate_channels=32,
        skip_channels=16, aux_channels=20, aux_context_window=2,
        upsample_params={"upsample_scales": [4, 4]},
    )
    ours, variables, ref = _export_and_load(
        "ParallelWaveGANGenerator", gen_params
    )
    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, 16 * 16, 1)).astype(np.float32)
    c = rng.standard_normal((2, 16 + 4, 20)).astype(np.float32)
    out = ours.apply(variables, jnp.asarray(z), jnp.asarray(c))
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(z.transpose(0, 2, 1)),
            torch.from_numpy(c.transpose(0, 2, 1)),
        )
    _assert_close(out, ref_out)


def test_export_melgan_generator():
    gen_params = dict(
        in_channels=20, out_channels=1, channels=32, stacks=2,
        upsample_scales=[4, 4],
    )
    ours, variables, ref = _export_and_load("MelGANGenerator", gen_params)
    rng = np.random.default_rng(1)
    c = rng.standard_normal((2, 16, 20)).astype(np.float32)
    out = ours.apply(variables, jnp.asarray(c))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(c.transpose(0, 2, 1)))
    _assert_close(out, ref_out)


def test_export_hifigan_generator():
    gen_params = dict(
        in_channels=20, channels=32, upsample_scales=[4, 4],
        upsample_kernel_sizes=[8, 8], resblock_kernel_sizes=[3, 5],
        resblock_dilations=[[1, 3], [1, 3]],
    )
    ours, variables, ref = _export_and_load("HiFiGANGenerator", gen_params)
    rng = np.random.default_rng(2)
    c = rng.standard_normal((2, 16, 20)).astype(np.float32)
    out = ours.apply(variables, jnp.asarray(c))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(c.transpose(0, 2, 1)))
    _assert_close(out, ref_out)


def test_export_style_melgan_generator():
    gen_params = dict(
        in_channels=32, aux_channels=20, channels=16, out_channels=1,
        kernel_size=9, dilation=2,
        noise_upsample_scales=[2, 2], noise_upsample_activation_params={
            "negative_slope": 0.2,
        },
        upsample_scales=[2, 2, 1],
    )
    ours, variables, ref = _export_and_load(
        "StyleMelGANGenerator", gen_params
    )
    rng = np.random.default_rng(3)
    nf = int(np.prod(gen_params["noise_upsample_scales"]))
    z = rng.standard_normal((2, 1, 32)).astype(np.float32)
    c = rng.standard_normal((2, nf, 20)).astype(np.float32)
    out = ours.apply(variables, jnp.asarray(c), jnp.asarray(z))
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(c.transpose(0, 2, 1)),
            torch.from_numpy(z.transpose(0, 2, 1)),
        )
    _assert_close(out, ref_out)


def test_save_reference_checkpoint_loads_in_reference(tmp_path):
    """The written .pkl must load through the reference's utils.load_model."""
    import yaml

    gen_params = dict(
        in_channels=20, out_channels=1, channels=32, upsample_scales=[4, 4],
        upsample_kernel_sizes=[8, 8], resblock_kernel_sizes=[3],
        resblock_dilations=[[1, 3]],
    )
    config = {
        "generator_type": "HiFiGANGenerator",
        "generator_params": gen_params,
        "format": "hdf5",  # reference load_model reads it (utils.py:335)
    }
    ours = get_model_class("HiFiGANGenerator")(**gen_params)
    variables = ours.init({"params": jax.random.key(0)}, jnp.zeros((1, 8, 20)))
    pkl = str(tmp_path / "checkpoint-123steps.pkl")
    save_reference_checkpoint(
        pkl, variables["params"], config, steps=123
    )
    with open(tmp_path / "config.yml", "w") as f:
        yaml.dump(config, f)
    from parallel_wavegan.utils import load_model as ref_load_model

    ref = ref_load_model(pkl)
    ref.remove_weight_norm()
    ref.eval()
    c = np.random.default_rng(4).standard_normal((20, 12)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref.inference(torch.from_numpy(c.T)).numpy()
    y_ours = ours.apply(variables, jnp.asarray(c.T[None]))[0]
    np.testing.assert_allclose(
        np.asarray(y_ours), y_ref, rtol=1e-4, atol=1e-5
    )
