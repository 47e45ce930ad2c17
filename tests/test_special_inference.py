"""Inference paths for the research variants: discrete-symbol generators,
UHiFiGAN (f0+excitation), and the VQVAE wav2wav encode/decode loop — the
analogue of the reference's decode.py branches (bin/decode.py:236-255,
366-385) plus the token preprocessing CLI."""

import subprocess
import sys

import numpy as np
import jax

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.utils.io import read_hdf5, write_wav
from parallelwavegan_tpu.utils.model_loader import InferenceModel

TINY_TRUNK = {
    "channels": 32,
    "upsample_scales": (4, 2),
    "upsample_kernel_sizes": (8, 4),
    "resblock_kernel_sizes": (3,),
    "resblock_dilations": ((1, 3),),
}


def _build(gen_type, gen_params, example_args, extra_cfg=None):
    cls = get_model_class(gen_type)
    gen = cls(**gen_params)
    variables = gen.init(jax.random.key(0), *example_args)
    config = {
        "generator_type": gen_type,
        "generator_params": gen_params,
        **(extra_cfg or {}),
    }
    return InferenceModel(config, variables)


def test_discrete_hifigan_inference():
    gen_params = dict(
        in_channels=16, num_embs=10, num_spk_embs=4, spk_emb_dim=16,
        **TINY_TRUNK,
    )
    tokens = np.stack(
        [np.arange(12) % 10, np.full(12, 2)], axis=-1
    ).astype(np.float32)
    model = _build(
        "DiscreteSymbolHiFiGANGenerator", gen_params,
        [tokens[None]],
    )
    y = model.inference(tokens)
    assert y.shape == (12 * 8, 1)
    assert np.isfinite(y).all()


def test_discrete_duration_inference_crops_by_predicted_durations():
    gen_params = dict(
        in_channels=16, num_embs=10, num_spk_embs=4, spk_emb_dim=16,
        max_reg_len=64, **TINY_TRUNK,
    )
    tokens = np.stack(
        [np.arange(6) % 10, np.full(6, 1)], axis=-1
    ).astype(np.float32)
    model = _build(
        "DiscreteSymbolDurationGenerator", gen_params,
        [tokens[None], np.ones((1, 6), np.int32)],
    )
    y = model.inference(tokens)
    assert y.ndim == 2 and y.shape[1] == 1
    assert y.shape[0] % 8 == 0
    assert y.shape[0] <= 64 * 8


def test_discrete_f0_inference():
    gen_params = dict(
        in_channels=16, num_embs=10, num_spk_embs=0, linear_channel=8,
        **TINY_TRUNK,
    )
    tokens = (np.arange(12) % 10).astype(np.float32)[:, None]
    f0 = np.linspace(100, 200, 12).astype(np.float32)
    model = _build(
        "DiscreteSymbolF0Generator", gen_params,
        [tokens[None], f0[None, :, None]],
    )
    y = model.inference(tokens, f0=f0)
    assert y.shape == (12 * 8, 1)


def test_uhifigan_inference():
    gen_params = dict(
        in_channels=80,
        channels=16,
        downsample_scales=(4, 2),
        downsample_kernel_sizes=(8, 4),
        upsample_scales=(2, 4),
        upsample_kernel_sizes=(4, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    frames, hop = 8, 8
    mel = np.random.default_rng(0).standard_normal((frames, 80)).astype(
        np.float32
    )
    f0 = np.full(frames, 150.0, np.float32)
    excitation = np.random.default_rng(1).standard_normal(
        frames * hop
    ).astype(np.float32)
    model = _build(
        "UHiFiGANGenerator", gen_params,
        [mel[None], f0[None, :, None], excitation[None, :, None]],
    )
    y = model.inference(mel, f0=f0, excitation=excitation)
    assert y.shape[0] == frames * hop
    assert np.isfinite(y).all()


def test_vqvae_encode_decode_roundtrip():
    gen_params = dict(
        num_embeds=8, embed_dim=16,
        encoder_conf={
            "out_channels": 16, "downsample_scales": [4, 2],
            "max_downsample_channels": 32, "channels": 8,
        },
        decoder_conf={
            "in_channels": 16, "upsample_scales": [4, 2],
            "channels": 16, "stacks": 1,
        },
    )
    audio = np.random.default_rng(0).standard_normal(256).astype(np.float32)
    model = _build(
        "VQVAE", gen_params, [audio[None, :, None]],
    )
    idx = model.vq_encode(audio)
    assert idx.shape == (256 // 8,)
    assert (idx >= 0).all() and (idx < 8).all()
    y = model.vq_decode(idx)
    assert y.shape == (256, 1)


def test_vqvae_global_conditioned_decode():
    gen_params = dict(
        num_embeds=8, embed_dim=16,
        num_global_embeds=4, global_embed_dim=8,
        encoder_conf={
            "out_channels": 16, "downsample_scales": [4, 2],
            "max_downsample_channels": 32, "channels": 8,
        },
        decoder_conf={
            "in_channels": 24, "upsample_scales": [4, 2],
            "channels": 16, "stacks": 1,
        },
    )
    audio = np.random.default_rng(0).standard_normal(128).astype(np.float32)
    model = _build(
        "VQVAE", gen_params,
        [audio[None, :, None], None, np.zeros((1,), np.int32)],
    )
    idx = model.vq_encode(audio)
    y = model.vq_decode(idx, g=2)
    assert y.shape == (128, 1)


def test_preprocess_tokens_cli(tmp_path):
    import yaml

    sr, hop, n = 16000, 320, 6400
    wavdir = tmp_path / "wav"
    wavdir.mkdir()
    rng = np.random.default_rng(0)
    with open(tmp_path / "text", "w") as f:
        for i in range(3):
            write_wav(
                str(wavdir / f"utt{i}.wav"),
                (rng.standard_normal(n) * 0.1).astype(np.float32), sr,
            )
            toks = rng.integers(0, 50, n // hop)
            f.write(f"utt{i} " + " ".join(map(str, toks.tolist())) + "\n")
    with open(tmp_path / "utt2spk", "w") as f:
        f.write("utt0 spkA\nutt1 spkA\nutt2 spkB\n")
    with open(tmp_path / "spk2idx", "w") as f:
        f.write("spkA 0\nspkB 1\n")
    config = {
        "sampling_rate": sr, "hop_size": hop, "format": "hdf5",
        "trim_silence": False, "global_gain_scale": 1.0,
    }
    with open(tmp_path / "conf.yaml", "w") as f:
        yaml.dump(config, f)

    subprocess.run(
        [
            sys.executable, "-m", "parallelwavegan_tpu.bin.preprocess_tokens",
            "--rootdir", str(wavdir), "--text", str(tmp_path / "text"),
            "--utt2spk", str(tmp_path / "utt2spk"),
            "--spk2idx", str(tmp_path / "spk2idx"),
            "--dumpdir", str(tmp_path / "dump"),
            "--config", str(tmp_path / "conf.yaml"),
        ],
        check=True,
    )
    feats = read_hdf5(str(tmp_path / "dump" / "utt2.h5"), "feats")
    wave = read_hdf5(str(tmp_path / "dump" / "utt2.h5"), "wave")
    assert feats.shape == (n // hop, 2)
    assert (feats[:, 1] == 1).all()  # spkB index
    assert len(wave) == feats.shape[0] * hop
