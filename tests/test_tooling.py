"""Tooling tests: checkpoint converter, export, launcher, pretrained
registry, kaldi readers."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_convert_reference_checkpoint_roundtrip(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import import_reference

    import_reference()
    import parallel_wavegan.models as ref_models
    import yaml

    gen_params = {
        "in_channels": 20, "channels": 64, "upsample_scales": [4, 4],
        "upsample_kernel_sizes": [8, 8], "resblock_kernel_sizes": [3],
        "resblock_dilations": [[1, 3]],
    }
    config = {
        "generator_type": "HiFiGANGenerator",
        "generator_params": gen_params,
        "discriminator_type": "ParallelWaveGANDiscriminator",
        "discriminator_params": {"layers": 3, "conv_channels": 8},
        "hop_size": 16, "num_mels": 20, "batch_max_steps": 256,
        "sampling_rate": 8000,
    }
    torch.manual_seed(0)
    ref = ref_models.HiFiGANGenerator(**gen_params)
    ref.eval()
    pkl = str(tmp_path / "checkpoint-500steps.pkl")
    torch.save({"model": {"generator": ref.state_dict()}, "steps": 500}, pkl)
    with open(tmp_path / "config.yml", "w") as f:
        yaml.dump(config, f)

    from parallelwavegan_tpu.bin import convert_checkpoint

    outdir = str(tmp_path / "converted")
    monkeypatch.setattr(
        sys, "argv",
        ["prog", "--checkpoint", pkl, "--outdir", outdir],
    )
    convert_checkpoint.main()
    out = os.path.join(outdir, "checkpoint-500steps.ckpt")
    assert os.path.exists(out)

    # converted checkpoint must synthesize identically to the .pkl path
    from parallelwavegan_tpu.utils.model_loader import load_model

    mel = np.random.default_rng(0).standard_normal((20, 20)).astype(np.float32)
    y_pkl = load_model(pkl, config).inference(mel)
    y_ckpt = load_model(out).inference(mel)
    np.testing.assert_allclose(y_pkl, y_ckpt, rtol=1e-5, atol=1e-6)


def test_export_generator_roundtrip(tmp_path):
    import yaml

    from parallelwavegan_tpu.models import MelGANGenerator
    from parallelwavegan_tpu.utils.export import export_generator, load_exported
    from parallelwavegan_tpu.utils.model_loader import InferenceModel

    config = {
        "generator_type": "MelGANGenerator",
        "generator_params": {
            "in_channels": 20, "channels": 64, "upsample_scales": [4, 4],
            "stacks": 1, "use_weight_norm": False,
        },
        "num_mels": 20,
    }
    gen = MelGANGenerator(**{**config["generator_params"],
                             "upsample_scales": (4, 4)})
    mel = jnp.zeros((1, 16, 20))
    variables = gen.init({"params": jax.random.key(0)}, mel)
    model = InferenceModel(config, variables, fold_norm=False)

    blob = export_generator(model, batch_size=1, num_frames=16)
    assert len(blob) > 0
    fn = load_exported(blob)
    y = fn(np.zeros((1, 16, 20), np.float32))
    out = y[0] if isinstance(y, (tuple, list)) else y
    assert np.asarray(out).shape == (1, 16 * 16, 1)


def test_launcher_spawns_processes(tmp_path):
    script = tmp_path / "echo_rank.py"
    script.write_text(
        "import os, sys\n"
        "print('RANK', os.environ['RANK'], 'WORLD', os.environ['WORLD_SIZE'])\n"
    )
    result = subprocess.run(
        [sys.executable, "-m", "parallelwavegan_tpu.distributed.launch",
         "--nproc_per_node", "2", str(script)],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert result.returncode == 0, result.stderr
    assert "RANK 0 WORLD 2" in result.stdout
    assert "RANK 1 WORLD 2" in result.stdout


def test_multiprocess_training_matches_single_process(tmp_path):
    """Two OS processes (4 virtual CPU devices each) joined via
    jax.distributed through the launcher must produce the same losses and
    parameters as the single-process 8-device run — the executable analogue
    of the reference's DDP all-reduce equivalence (bin/train.py:1078-1082,
    1558-1567)."""
    import json
    import socket

    sys.path.insert(0, os.path.dirname(__file__))
    try:
        import mp_train_worker
    finally:
        sys.path.pop(0)

    # single-process 8-device baseline (pytest process already has the
    # 8-device CPU mesh from conftest)
    want = mp_train_worker.run(None)

    out_json = tmp_path / "mp.json"
    with socket.socket() as s:  # free rendezvous port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    result = subprocess.run(
        [sys.executable, "-m", "parallelwavegan_tpu.distributed.launch",
         "--nproc_per_node", "2", "--master_port", str(port),
         os.path.join(os.path.dirname(__file__), "mp_train_worker.py"),
         str(out_json)],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
        env={
            **{k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
            "PYTHONPATH": "/root/repo:" + os.environ.get("PYTHONPATH", ""),
        },
    )
    if result.returncode != 0 and (
        "gloo" in result.stderr.lower()
        or "collectives" in result.stderr.lower()
    ):
        pytest.skip(f"CPU cross-process collectives unavailable: "
                    f"{result.stderr[-200:]}")
    assert result.returncode == 0, result.stderr[-2000:]
    got = json.loads(out_json.read_text())
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-4, err_msg=k)


def test_pretrained_registry(tmp_path, monkeypatch):
    from parallelwavegan_tpu.utils import pretrained

    assert "ljspeech_hifigan.v1" in pretrained.PRETRAINED_MODEL_LIST
    with pytest.raises(KeyError):
        pretrained.download_pretrained_model("not_a_tag")
    monkeypatch.setenv("PWG_TPU_CACHE", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        pretrained.download_pretrained_model("ljspeech_hifigan.v1")
    tag_dir = tmp_path / "ljspeech_hifigan.v1"
    tag_dir.mkdir()
    (tag_dir / "checkpoint-2500000steps.pkl").write_bytes(b"x")
    path = pretrained.download_pretrained_model("ljspeech_hifigan.v1")
    assert path.endswith(".pkl")


def test_kaldi_ark_reader(tmp_path):
    """Write a kaldi binary matrix by hand and read it back."""
    import struct

    from parallelwavegan_tpu.utils.kaldiio_lite import ArkScpReader

    mat = np.arange(12, dtype=np.float32).reshape(3, 4)
    ark = tmp_path / "feats.ark"
    with open(ark, "wb") as f:
        f.write(b"utt1 ")
        offset = f.tell()
        f.write(b"\x00B")
        f.write(b"FM ")
        f.write(b"\x04" + struct.pack("<i", 3))
        f.write(b"\x04" + struct.pack("<i", 4))
        f.write(mat.tobytes())
    scp = tmp_path / "feats.scp"
    scp.write_text(f"utt1 {ark}:{offset}\n")
    reader = ArkScpReader(str(scp))
    np.testing.assert_array_equal(reader["utt1"], mat)


def test_wav_scp_and_segments(tmp_path):
    from parallelwavegan_tpu.utils.io import write_wav
    from parallelwavegan_tpu.utils.kaldiio_lite import WavScpReader

    sr = 8000
    wave = np.linspace(-0.5, 0.5, sr).astype(np.float32)
    write_wav(str(tmp_path / "a.wav"), wave, sr)
    (tmp_path / "wav.scp").write_text(f"rec1 {tmp_path}/a.wav\n")
    (tmp_path / "segments").write_text("seg1 rec1 0.25 0.75\n")
    reader = WavScpReader(str(tmp_path / "wav.scp"),
                          str(tmp_path / "segments"))
    seg, rate = reader["seg1"]
    assert rate == sr
    assert len(seg) == sr // 2


def test_wav_scp_command_pipe(tmp_path):
    """Kaldi command-pipe rxfiles ("cmd |") stream wav bytes from stdout
    (kaldiio semantics, used by flac-based corpora)."""
    from parallelwavegan_tpu.utils.io import write_wav
    from parallelwavegan_tpu.utils.kaldiio_lite import WavScpReader

    sr = 8000
    wave = np.linspace(-0.5, 0.5, sr).astype(np.float32)
    write_wav(str(tmp_path / "a.wav"), wave, sr)
    (tmp_path / "wav.scp").write_text(f"rec1 cat {tmp_path}/a.wav |\n")
    reader = WavScpReader(str(tmp_path / "wav.scp"))
    piped, rate = reader["rec1"]
    assert rate == sr and len(piped) == sr
    np.testing.assert_allclose(piped, wave, atol=2.0 / 32767)


def test_convert_checkpoint_to_reference_direction(tmp_path, monkeypatch):
    """ckpt -> --to-reference .pkl must load via OUR .pkl loader too and
    synthesize identically (full CLI round trip)."""
    pytest.importorskip("torch")
    import yaml

    import jax

    from parallelwavegan_tpu.bin import convert_checkpoint
    from parallelwavegan_tpu.engine.build import init_train_state
    from parallelwavegan_tpu.engine.checkpoint import save_checkpoint
    from parallelwavegan_tpu.utils.model_loader import load_model

    config = {
        "generator_type": "MelGANGenerator",
        "generator_params": {
            "in_channels": 20, "out_channels": 1, "channels": 32,
            "stacks": 2, "upsample_scales": [4, 4],
        },
        "discriminator_type": "MelGANMultiScaleDiscriminator",
        "discriminator_params": {"scales": 2},
        "hop_size": 16, "num_mels": 20, "batch_max_steps": 256,
        "sampling_rate": 8000, "format": "hdf5",
    }
    import jax.numpy as jnp

    state, *_ = init_train_state(config, jax.random.key(7))
    state = state.replace(steps=jnp.asarray(42, jnp.int32))
    ckpt = str(tmp_path / "checkpoint-42steps.ckpt")
    save_checkpoint(ckpt, state)
    with open(tmp_path / "config.yml", "w") as f:
        yaml.dump(config, f)

    outdir = str(tmp_path / "exported")
    monkeypatch.setattr(
        sys, "argv",
        ["prog", "--checkpoint", ckpt, "--outdir", outdir, "--to-reference"],
    )
    convert_checkpoint.main()
    pkl = os.path.join(outdir, "checkpoint-42steps.pkl")
    assert os.path.exists(pkl)

    mel = np.random.default_rng(5).standard_normal((20, 20)).astype(np.float32)
    y_ckpt = load_model(ckpt, config).inference(mel)
    y_pkl = load_model(pkl, config).inference(mel)
    np.testing.assert_allclose(y_ckpt, y_pkl, rtol=1e-5, atol=1e-6)


def test_generator_only_checkpoint_roundtrip(tmp_path):
    """save_generator_checkpoint -> load_model(.gckpt): synthesis must
    match the full-checkpoint path; bf16 storage halves the artifact."""
    import yaml

    from parallelwavegan_tpu.engine.checkpoint import (
        save_generator_checkpoint,
    )
    from parallelwavegan_tpu.models import MelGANGenerator
    from parallelwavegan_tpu.utils.model_loader import (
        InferenceModel,
        load_model,
    )

    config = {
        "generator_type": "MelGANGenerator",
        "generator_params": {
            "in_channels": 20, "channels": 32, "upsample_scales": [4, 4],
            "stacks": 1, "use_weight_norm": True,
        },
        "num_mels": 20,
        "sampling_rate": 16000,
    }
    gen = MelGANGenerator(**{**config["generator_params"],
                             "upsample_scales": (4, 4)})
    mel = np.random.default_rng(0).standard_normal((30, 20)).astype(
        np.float32
    )
    variables = jax.device_get(
        gen.init({"params": jax.random.key(0)}, jnp.asarray(mel[None]))
    )
    ref_model = InferenceModel(config, variables)
    ref = ref_model.inference(mel)

    path = str(tmp_path / "gen.gckpt")
    save_generator_checkpoint(path, variables)
    with open(str(tmp_path / "config.yml"), "w") as f:
        yaml.safe_dump(config, f)
    model = load_model(path)
    got = model.inference(mel)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    # bf16 storage: half the bytes, waveform still close
    path16 = str(tmp_path / "gen16.gckpt")
    save_generator_checkpoint(path16, variables, dtype=jnp.bfloat16)
    assert os.path.getsize(path16) < 0.6 * os.path.getsize(path)
    got16 = load_model(path16).inference(mel)
    assert np.mean((got16 - ref) ** 2) < 1e-4 * max(np.mean(ref**2), 1e-12)
