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


def test_export_discrete_hifigan_generator():
    import jax.numpy as jnp
    import parallel_wavegan.models as ref_models

    gen_params = dict(
        in_channels=16, channels=32, upsample_scales=(4, 2),
        upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), num_embs=10, num_spk_embs=4,
        spk_emb_dim=16,
    )
    ours = get_model_class("DiscreteSymbolHiFiGANGenerator")(**gen_params)
    variables = ours.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 8, 2), jnp.int32)
    )
    state = export_generator_state_dict(
        variables["params"], "DiscreteSymbolHiFiGANGenerator",
        {"generator_params": gen_params},
    )
    ref = ref_models.DiscreteSymbolHiFiGANGenerator(**gen_params)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in state.items()}, strict=True
    )
    assert not missing and not unexpected
    ref.eval()
    rng = np.random.default_rng(8)
    c = np.stack(
        [rng.integers(0, 10, (2, 12)), rng.integers(0, 4, (2, 12))], axis=-1
    ).astype(np.int64)
    c[:, :, 1] = c[:, :1, 1]
    out = ours.apply(variables, jnp.asarray(c))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(c.transpose(0, 2, 1)))
    _assert_close(out, ref_out)


def test_export_discrete_f0_generator():
    import jax.numpy as jnp
    import parallel_wavegan.models as ref_models

    gen_params = dict(
        in_channels=16, channels=32, upsample_scales=(4, 2),
        upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), num_embs=10, num_spk_embs=0,
        spk_emb_dim=16, linear_channel=8, use_f0=True, use_weight_sum=True,
        layer_num=3,
    )
    ours = get_model_class("DiscreteSymbolF0Generator")(**gen_params)
    variables = ours.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 8, 3), jnp.int32), jnp.zeros((1, 8, 1)),
    )
    state = export_generator_state_dict(
        variables["params"], "DiscreteSymbolF0Generator",
        {"generator_params": gen_params},
    )
    ref = ref_models.DiscreteSymbolF0Generator(**gen_params)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in state.items()}, strict=False
    )
    # reference constructs an unused spk_emb even with num_spk_embs=0
    assert [m for m in missing if not m.startswith("spk_emb")] == []
    assert not unexpected
    ref.eval()
    rng = np.random.default_rng(9)
    c = rng.integers(0, 10, (2, 12, 3)).astype(np.int64)
    f0 = rng.standard_normal((2, 12, 1)).astype(np.float32)
    out = ours.apply(variables, jnp.asarray(c), jnp.asarray(f0))
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(c.transpose(0, 2, 1)),
            torch.from_numpy(f0.transpose(0, 2, 1)),
        )
    _assert_close(out, ref_out)


def test_export_uhifigan_generator():
    import jax.numpy as jnp
    from parallel_wavegan.models.uhifigan import UHiFiGANGenerator as Ref

    gen_params = dict(
        in_channels=20, channels=32, downsample_scales=(2, 2),
        downsample_kernel_sizes=(4, 4), upsample_scales=(2, 2),
        upsample_kernel_sizes=(4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    ours = get_model_class("UHiFiGANGenerator")(**gen_params)
    T = 64
    variables = ours.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, T // 4, 20)), None, jnp.zeros((1, T, 1)),
    )
    state = export_generator_state_dict(
        variables["params"], "UHiFiGANGenerator",
        {"generator_params": gen_params},
    )
    ref = Ref(**{**gen_params,
                 "downsample_scales": list(gen_params["downsample_scales"]),
                 "downsample_kernel_sizes": list(
                     gen_params["downsample_kernel_sizes"]),
                 "upsample_scales": list(gen_params["upsample_scales"]),
                 "upsample_kernel_sizes": list(
                     gen_params["upsample_kernel_sizes"]),
                 "resblock_dilations": [list(d) for d in
                                        gen_params["resblock_dilations"]]})
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in state.items()}, strict=True
    )
    assert not missing and not unexpected
    ref.eval()
    rng = np.random.default_rng(10)
    c = rng.standard_normal((2, T // 4, 20)).astype(np.float32)
    exc = rng.standard_normal((2, T, 1)).astype(np.float32)
    out = ours.apply(variables, jnp.asarray(c), None, jnp.asarray(exc), True)
    with torch.no_grad():
        ref_out = ref(
            c=torch.from_numpy(c.transpose(0, 2, 1)),
            excitation=torch.from_numpy(exc.transpose(0, 2, 1)),
        )
    _assert_close(out, ref_out)


def test_export_vqvae():
    import jax.numpy as jnp
    import parallel_wavegan.models as ref_models

    gen_params = dict(
        num_embeds=32, embed_dim=16,
        encoder_conf={"out_channels": 16, "downsample_scales": [4, 4],
                      "channels": 8, "max_downsample_channels": 32},
        decoder_conf={"in_channels": 16, "upsample_scales": [4, 4],
                      "channels": 32, "stacks": 2},
    )
    ours = get_model_class("VQVAE")(**gen_params)
    variables = ours.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 256, 1))
    )
    state = export_generator_state_dict(
        variables["params"], "VQVAE", {"generator_params": gen_params}
    )
    ref = ref_models.VQVAE(**gen_params)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in state.items()}, strict=True
    )
    assert not missing and not unexpected
    ref.eval()
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 256, 1)).astype(np.float32)
    y, _, _ = ours.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        y_ref, _, _ = ref(torch.from_numpy(x.transpose(0, 2, 1)))
    _assert_close(y, y_ref)
