"""Training-engine tests: trainability smoke over an 8-device CPU mesh
(the fake-cluster substitute; SURVEY.md section 4), warm-up gating,
checkpoint round-trip, multiband + HiFiGAN loss wiring."""

import os

import numpy as np
import pytest

import jax

from parallelwavegan_tpu.datasets import Collater
from parallelwavegan_tpu.datasets.loader import DataLoader
from parallelwavegan_tpu.engine import Trainer


class SyntheticAudioMelDataset:
    """Random (audio, mel) pairs obeying len(audio) == len(mel) * hop."""

    def __init__(self, n=8, frames=40, hop=64, num_mels=16, seed=0):
        rng = np.random.default_rng(seed)
        self.items = [
            (
                rng.standard_normal(frames * hop).astype(np.float32) * 0.1,
                rng.standard_normal((frames, num_mels)).astype(np.float32),
            )
            for _ in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        return self.items[idx]


def _base_config(tmp_path):
    return {
        "sampling_rate": 16000,
        "hop_size": 64,
        "num_mels": 16,
        "batch_max_steps": 512,
        "batch_size": 8,
        "outdir": str(tmp_path),
        "train_max_steps": 4,
        "save_interval_steps": 1000,
        "eval_interval_steps": 2,
        "log_interval_steps": 2,
        "lambda_adv": 1.0,
        "stft_loss_params": {
            "fft_sizes": [64, 128], "hop_sizes": [16, 32],
            "win_lengths": [48, 96],
        },
        "generator_optimizer_params": {"lr": 1e-4},
        "discriminator_optimizer_params": {"lr": 1e-4},
        "generator_scheduler_params": {"step_size": 100, "gamma": 0.5},
        "discriminator_scheduler_params": {"step_size": 100, "gamma": 0.5},
        "generator_grad_norm": 10,
        "discriminator_grad_norm": 1,
    }


def _loader(config, use_noise_input, aux_context_window=2, n=8):
    ds = SyntheticAudioMelDataset(
        n=n, hop=config["hop_size"], num_mels=config["num_mels"]
    )
    collater = Collater(
        batch_max_steps=config["batch_max_steps"],
        hop_size=config["hop_size"],
        aux_context_window=aux_context_window,
        use_noise_input=use_noise_input,
        rng=np.random.default_rng(0),
    )
    return DataLoader(
        ds, collater, config["batch_size"], seed=0, prefetch=0
    )


def test_pwg_training_with_warmup_crossing(tmp_path):
    config = _base_config(tmp_path)
    config.update(
        generator_type="ParallelWaveGANGenerator",
        generator_params={
            "layers": 4, "stacks": 2, "residual_channels": 8,
            "gate_channels": 16, "skip_channels": 8, "aux_channels": 16,
            "aux_context_window": 2,
            "upsample_params": {"upsample_scales": [4, 4, 4]},
        },
        discriminator_type="ParallelWaveGANDiscriminator",
        discriminator_params={"layers": 3, "conv_channels": 8},
        discriminator_train_start_steps=2,
        generator_train_start_steps=0,
    )
    trainer = Trainer(
        config,
        _loader(config, use_noise_input=True),
        eval_loader=_loader(config, use_noise_input=True, n=8),
    )
    trainer.run()
    assert trainer.steps == 4
    # crossed into adversarial training: discriminator loss was logged
    ckpts = [f for f in os.listdir(tmp_path) if f.endswith(".ckpt")]
    assert len(ckpts) == 1
    preds = os.path.join(tmp_path, "predictions")
    assert os.path.isdir(preds)


def test_hifigan_training_with_msmpd(tmp_path):
    config = _base_config(tmp_path)
    config.update(
        generator_type="HiFiGANGenerator",
        generator_params={
            "in_channels": 16, "channels": 32, "upsample_scales": (4, 4, 4),
            "upsample_kernel_sizes": (8, 8, 8),
            "resblock_kernel_sizes": (3,), "resblock_dilations": ((1, 3),),
        },
        discriminator_type="HiFiGANMultiScaleMultiPeriodDiscriminator",
        discriminator_params={
            "scales": 2,
            "scale_discriminator_params": {
                "channels": 8, "downsample_scales": (2, 2), "max_groups": 4,
                "max_downsample_channels": 32,
            },
            "follow_official_norm": True,
            "periods": (2, 3),
            "period_discriminator_params": {
                "channels": 4, "downsample_scales": (3, 1),
                "max_downsample_channels": 16,
            },
        },
        use_stft_loss=False,
        use_mel_loss=True,
        mel_loss_params={
            "fs": 16000, "fft_size": 128, "hop_size": 32, "win_length": 128,
            "num_mels": 16, "fmin": 0, "fmax": 8000, "log_base": None,
        },
        use_feat_match_loss=True,
        lambda_aux=45.0,
        lambda_feat_match=2.0,
        generator_train_start_steps=1,
        discriminator_train_start_steps=0,
        train_max_steps=3,
    )
    trainer = Trainer(
        config, _loader(config, use_noise_input=False, aux_context_window=0)
    )
    trainer.run()
    assert trainer.steps == 3
    # spectral-norm u must have been updated by D training
    state = jax.device_get(trainer.state)
    assert "spectral" in state.extra_d


def test_fused_real_fake_discriminator_matches_two_pass():
    """fuse_real_fake_discriminator=true (one concat pass) must produce the
    same step metrics as the reference-shaped two-pass path: every module
    is batch-pointwise, so the fused split is mathematically identical
    (weight norm; spectral norm off so the power-iteration count can't
    differ)."""
    import jax
    import jax.numpy as jnp

    from parallelwavegan_tpu.engine.build import (
        example_batch,
        init_train_state,
    )
    from parallelwavegan_tpu.engine.criterion import build_criterion
    from parallelwavegan_tpu.engine.step import build_steps

    base = {
        "sampling_rate": 8000, "hop_size": 64, "num_mels": 16,
        "batch_max_steps": 512, "batch_size": 4,
        "generator_type": "HiFiGANGenerator",
        "generator_params": {
            "in_channels": 16, "channels": 16, "upsample_scales": (4, 4, 4),
            "upsample_kernel_sizes": (8, 8, 8),
            "resblock_kernel_sizes": (3,), "resblock_dilations": ((1, 3),),
        },
        "discriminator_type": "HiFiGANMultiScaleMultiPeriodDiscriminator",
        "discriminator_params": {
            "scales": 2,
            "scale_discriminator_params": {
                "channels": 8, "downsample_scales": (2, 2), "max_groups": 4,
                "max_downsample_channels": 32,
            },
            "follow_official_norm": False,
            "periods": (2, 3),
            "period_discriminator_params": {
                "channels": 4, "downsample_scales": (3, 1),
                "max_downsample_channels": 16,
            },
        },
        "use_stft_loss": False,
        "use_mel_loss": True,
        "mel_loss_params": {
            "fs": 8000, "fft_size": 128, "hop_size": 32, "win_length": 128,
            "num_mels": 16, "fmin": 0, "fmax": 4000, "log_base": None,
        },
        "use_feat_match_loss": True,
        "lambda_aux": 1.0, "lambda_adv": 1.0, "lambda_feat_match": 2.0,
        "generator_optimizer_type": "Adam",
        "generator_optimizer_params": {"lr": 1e-4},
        "discriminator_optimizer_type": "Adam",
        "discriminator_optimizer_params": {"lr": 1e-4},
        "generator_grad_norm": -1, "discriminator_grad_norm": -1,
    }
    batch = {
        k: jnp.asarray(v) for k, v in example_batch(base, batch_size=4).items()
    }
    results = {}
    for fused in (False, True):
        config = dict(base, fuse_real_fake_discriminator=fused)
        state, g, d, og, od = init_train_state(config, jax.random.key(0))
        criterion = build_criterion(config)
        factory, _ = build_steps(config, g, d, criterion, og, od)
        step = factory(True, True, True)
        _, metrics = step(state, batch, jax.random.key(1))
        results[fused] = jax.device_get(metrics)
    assert set(results[True]) == set(results[False])
    for k in results[True]:
        np.testing.assert_allclose(
            results[True][k], results[False][k], rtol=2e-5, atol=1e-6,
            err_msg=k,
        )


def test_multiband_melgan_training(tmp_path):
    config = _base_config(tmp_path)
    config.update(
        generator_type="MelGANGenerator",
        generator_params={
            "in_channels": 16, "out_channels": 4, "channels": 64,
            "upsample_scales": [4, 4], "stacks": 2, "kernel_size": 7,
        },
        discriminator_type="MelGANMultiScaleDiscriminator",
        discriminator_params={
            "scales": 2, "channels": 8, "downsample_scales": [4, 4],
            "max_downsample_channels": 64,
        },
        # hop = 4*4*4subbands... full-band hop 16*4=64 == config hop
        use_subband_stft_loss=True,
        subband_stft_loss_params={
            "fft_sizes": [32, 64], "hop_sizes": [8, 16],
            "win_lengths": [24, 48],
        },
        use_feat_match_loss=False,
        discriminator_train_start_steps=1,
        train_max_steps=3,
    )
    trainer = Trainer(
        config, _loader(config, use_noise_input=False, aux_context_window=0)
    )
    trainer.run()
    assert trainer.steps == 3


def test_checkpoint_roundtrip(tmp_path):
    config = _base_config(tmp_path)
    config.update(
        generator_type="MelGANGenerator",
        generator_params={
            "in_channels": 16, "channels": 64, "upsample_scales": [8, 8],
            "stacks": 1,
        },
        discriminator_type="MelGANDiscriminator",
        discriminator_params={
            "channels": 8, "downsample_scales": [4],
            "max_downsample_channels": 32,
        },
        discriminator_train_start_steps=0,
        train_max_steps=2,
        eval_interval_steps=100,
    )
    trainer = Trainer(
        config, _loader(config, use_noise_input=False, aux_context_window=0)
    )
    trainer.run()
    ckpt = os.path.join(str(tmp_path), "checkpoint-2steps.ckpt")
    assert os.path.exists(ckpt)

    trainer2 = Trainer(
        config, _loader(config, use_noise_input=False, aux_context_window=0)
    )
    trainer2.load_checkpoint(ckpt)
    assert trainer2.steps == 2
    a = jax.device_get(trainer.state.params_g)
    b = jax.device_get(trainer2.state.params_g)
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pretrain_from_generator_gckpt(tmp_path):
    """--pretrain accepts a generator-only .gckpt: the generator
    warm-starts from the (possibly bf16-stored) distribution checkpoint
    while the discriminator and both optimizers stay fresh — the
    fine-tuning shape of the reference's --pretrain
    (/root/reference/parallel_wavegan/bin/train.py:152-191)."""
    import jax.numpy as jnp

    from parallelwavegan_tpu.engine.checkpoint import (
        save_generator_checkpoint,
    )

    config = _base_config(tmp_path)
    config.update(
        generator_type="MelGANGenerator",
        generator_params={
            "in_channels": 16, "channels": 64, "upsample_scales": [8, 8],
            "stacks": 1,
        },
        discriminator_type="MelGANDiscriminator",
        discriminator_params={
            "channels": 8, "downsample_scales": [4],
            "max_downsample_channels": 32,
        },
        discriminator_train_start_steps=0,
        train_max_steps=2,
        eval_interval_steps=100,
    )
    trainer = Trainer(
        config, _loader(config, use_noise_input=False, aux_context_window=0)
    )
    trainer.run()
    gckpt = os.path.join(str(tmp_path), "generator.gckpt")
    save_generator_checkpoint(
        gckpt, jax.device_get(trainer.state), dtype=jnp.bfloat16
    )

    trainer2 = Trainer(
        config, _loader(config, use_noise_input=False, aux_context_window=0)
    )
    trainer2.load_checkpoint(gckpt, load_only_params=True)
    a = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params_g))
    b = jax.tree_util.tree_leaves(jax.device_get(trainer2.state.params_g))
    for x, y in zip(a, b):
        # restored leaves keep the f32 training dtype, values match the
        # trained ones to bf16 storage precision
        assert np.asarray(y).dtype == np.asarray(x).dtype
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-2, atol=1e-2
        )
    # optimizer state is fresh (step counter back at 0)
    assert int(trainer2.steps) == 0


def test_batch_is_sharded_over_mesh(tmp_path):
    """The train batch must land sharded over all 8 virtual devices."""
    from parallelwavegan_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch = {"y": np.zeros((8, 64, 1), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert len(sharded["y"].sharding.device_set) == 8


def test_mixed_precision_train_step():
    """`mixed_precision: true` runs forwards in bf16 with f32 master params:
    one full adversarial step must produce finite losses, keep the param
    tree f32, and track the f32 step's losses closely."""
    import copy

    import jax
    import jax.numpy as jnp

    from parallelwavegan_tpu.engine.build import (
        example_batch,
        init_train_state,
    )
    from parallelwavegan_tpu.engine.criterion import build_criterion
    from parallelwavegan_tpu.engine.step import build_steps

    config = {
        "sampling_rate": 8000, "hop_size": 64, "num_mels": 40,
        "batch_max_steps": 512,
        "generator_type": "ParallelWaveGANGenerator",
        "generator_params": {
            "layers": 4, "stacks": 2, "residual_channels": 8,
            "gate_channels": 16, "skip_channels": 8, "aux_channels": 40,
            "aux_context_window": 2,
            "upsample_params": {"upsample_scales": [4, 4, 4]},
        },
        "discriminator_type": "ParallelWaveGANDiscriminator",
        "discriminator_params": {"layers": 3, "conv_channels": 8},
        "stft_loss_params": {
            "fft_sizes": [64, 128], "hop_sizes": [16, 32],
            "win_lengths": [48, 96],
        },
        "lambda_adv": 4.0,
        "generator_optimizer_params": {"lr": 1e-4},
        "discriminator_optimizer_params": {"lr": 5e-5},
        "generator_grad_norm": 10, "discriminator_grad_norm": 1,
    }
    rng = jax.random.key(0)
    batch = {
        k: jnp.asarray(v) for k, v in example_batch(config, 2).items()
    }
    losses = {}
    for mp in (False, True):
        cfg = copy.deepcopy(config)
        cfg["mixed_precision"] = mp
        state, g, d, og, od = init_train_state(cfg, rng)
        criterion = build_criterion(cfg)
        factory, _ = build_steps(cfg, g, d, criterion, og, od)
        step = factory(True, True, True)
        new_state, metrics = step(state, batch, rng)
        gl = float(metrics["generator_loss"])
        assert np.isfinite(gl)
        leaves = jax.tree_util.tree_leaves(new_state.params_g)
        assert all(x.dtype == jnp.float32 for x in leaves)
        losses[mp] = gl
    # bf16 forward must track the f32 loss closely
    assert abs(losses[True] - losses[False]) / abs(losses[False]) < 0.05


def test_reference_compat_config_keys():
    """Reference YAML key names (bin/train.py:1496-1507) must be honored:
    use_duration_loss / duration_loss_params select the duration criterion."""
    from parallelwavegan_tpu.engine.criterion import build_criterion

    c = build_criterion(
        {"use_duration_loss": True, "duration_loss_params": {"offset": 2.0}}
    )
    assert c["duration"].offset == 2.0
    # null params (reference sets duration_loss_params: null in some configs)
    c = build_criterion({"use_duration_loss": True,
                         "duration_loss_params": None})
    assert c["duration"].offset == 1.0
    assert "duration" not in build_criterion({})


def test_dispatch_queue_is_bounded(tmp_path, monkeypatch):
    """The async dispatch queue (config dispatch_queue_depth) must never
    hold more than `depth` in-flight steps, and must block on the oldest
    step exactly once per step beyond depth — this is the wedge fix for
    the host racing hundreds of dispatched steps ahead of the device
    (engine/trainer.py), which only reproduces on real TPU."""
    config = _base_config(tmp_path)
    config.update(
        generator_type="ParallelWaveGANGenerator",
        generator_params={
            "layers": 2, "stacks": 1, "residual_channels": 8,
            "gate_channels": 16, "skip_channels": 8, "aux_channels": 16,
            "aux_context_window": 2,
            "upsample_params": {"upsample_scales": [4, 4, 4]},
        },
        discriminator_type="ParallelWaveGANDiscriminator",
        discriminator_params={"layers": 2, "conv_channels": 8},
        discriminator_train_start_steps=0,
        generator_train_start_steps=0,
        train_max_steps=8,
        log_interval_steps=100,  # no mid-run reset: assert accumulation
        eval_interval_steps=100,
        dispatch_queue_depth=2,
    )
    trainer = Trainer(config, _loader(config, use_noise_input=True))

    blocked = []
    max_len = 0
    orig_block = jax.block_until_ready
    orig_step = trainer._train_step

    def counting_block(x):
        blocked.append(x)
        return orig_block(x)

    def watched_step(batch):
        nonlocal max_len
        orig_step(batch)
        max_len = max(max_len, len(trainer._inflight))

    monkeypatch.setattr(jax, "block_until_ready", counting_block)
    trainer._train_step = watched_step
    trainer.run()
    assert trainer.steps == 8
    # the very first call (steps=0) is a warm-up no-op (steps > start_steps
    # gating), so 7 steps actually dispatch work
    assert max_len == 2  # never exceeds depth
    assert len(blocked) == 7 - 2  # one block per step beyond depth
    # metrics still accumulate across all steps despite early readbacks
    assert trainer._accum_steps == 7
    assert np.isfinite(float(trainer.total_train_loss["train/generator_loss"]))


def test_dispatch_queue_depth_zero_disables_bound(tmp_path):
    config = _base_config(tmp_path)
    config.update(
        generator_type="ParallelWaveGANGenerator",
        generator_params={
            "layers": 2, "stacks": 1, "residual_channels": 8,
            "gate_channels": 16, "skip_channels": 8, "aux_channels": 16,
            "aux_context_window": 2,
            "upsample_params": {"upsample_scales": [4, 4, 4]},
        },
        discriminator_type="ParallelWaveGANDiscriminator",
        discriminator_params={"layers": 2, "conv_channels": 8},
        discriminator_train_start_steps=0,
        generator_train_start_steps=0,
        train_max_steps=3,
        dispatch_queue_depth=0,
    )
    trainer = Trainer(config, _loader(config, use_noise_input=True))
    trainer.run()
    assert trainer.steps == 3
    assert len(trainer._inflight) == 0


def test_generator_ema(tmp_path):
    """generator_ema_decay keeps an EMA of the generator params (a
    GAN-vocoder stabilizer the reference lacks): exact update math,
    checkpoint round-trip, legacy (pre-EMA) checkpoint migration, and
    serving the EMA weights via load_model(use_ema=True)."""
    from parallelwavegan_tpu.engine.build import (
        example_batch, init_train_state,
    )
    from parallelwavegan_tpu.engine.checkpoint import (
        load_checkpoint, save_checkpoint,
    )
    from parallelwavegan_tpu.engine.criterion import build_criterion
    from parallelwavegan_tpu.engine.step import build_steps
    from parallelwavegan_tpu.utils.io import save_config
    from parallelwavegan_tpu.utils.model_loader import load_model

    decay = 0.5  # large so one step moves the EMA visibly
    config = _base_config(tmp_path)
    config.update(
        generator_type="MelGANGenerator",
        generator_params={
            "in_channels": 16, "channels": 64, "upsample_scales": [8, 8],
            "stacks": 1,
        },
        discriminator_type="MelGANDiscriminator",
        discriminator_params={
            "channels": 8, "downsample_scales": [4],
            "max_downsample_channels": 32,
        },
        generator_ema_decay=decay,
    )
    rng = jax.random.key(0)
    state, g, d, opt_g, opt_d = init_train_state(config, rng)
    assert state.ema_g is not None
    criterion = build_criterion(config)
    factory, _ = build_steps(config, g, d, criterion, opt_g, opt_d)
    step = factory(True, True, True)
    batch = example_batch(config, batch_size=2)
    p0 = jax.device_get(state.params_g)
    new_state, _ = step(state, batch, rng)

    # exact EMA formula against the realized params
    p1 = jax.device_get(new_state.params_g)
    ema = jax.device_get(new_state.ema_g)
    jax.tree.map(
        lambda e, a, b: np.testing.assert_allclose(
            np.asarray(e), decay * np.asarray(a) + (1 - decay) * np.asarray(b),
            rtol=1e-6, atol=1e-7,
        ),
        ema, p0, p1,
    )

    # round-trip through a checkpoint (EMA enabled on both sides)
    ckpt = os.path.join(str(tmp_path), "checkpoint-1steps.ckpt")
    save_checkpoint(ckpt, new_state)
    template = jax.eval_shape(
        lambda: init_train_state(config, jax.random.key(0))[0]
    )
    restored = load_checkpoint(ckpt, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        jax.device_get(restored.ema_g), ema,
    )

    # legacy checkpoint (run without EMA) into an EMA-enabled template:
    # the EMA stream seeds from the restored params
    legacy_cfg = dict(config)
    legacy_cfg.pop("generator_ema_decay")
    legacy_state, *_ = init_train_state(legacy_cfg, rng)
    assert legacy_state.ema_g is None
    legacy_ckpt = os.path.join(str(tmp_path), "legacy.ckpt")
    save_checkpoint(legacy_ckpt, legacy_state)
    migrated = load_checkpoint(legacy_ckpt, template)
    jax.tree.map(
        lambda e, p: np.testing.assert_array_equal(
            np.asarray(e), np.asarray(p)
        ),
        jax.device_get(migrated.ema_g), jax.device_get(migrated.params_g),
    )
    # and the reverse: EMA checkpoint into an EMA-disabled template
    legacy_template = jax.eval_shape(
        lambda: init_train_state(legacy_cfg, jax.random.key(0))[0]
    )
    dropped = load_checkpoint(ckpt, legacy_template)
    assert dropped.ema_g is None

    # serving: use_ema picks the EMA stream (differs from raw after a step)
    save_config(os.path.join(str(tmp_path), "config.yml"), config)
    m_raw = load_model(ckpt, config)
    m_ema = load_model(ckpt, config, use_ema=True)
    mel = np.random.default_rng(0).standard_normal((20, 16)).astype(
        np.float32
    )
    y_raw = m_raw.inference(mel)
    y_ema = m_ema.inference(mel)
    assert y_raw.shape == y_ema.shape
    assert not np.allclose(y_raw, y_ema)


def test_per_device_rng_decorrelation():
    """Pin the per-device rng semantics of the sharded train step
    (engine.step.fold_step_rng): every data-parallel shard gets a unique
    stream (DDP per-process RNG analogue), and the full StyleMelGAN
    family — the rng-delicate one: in-model noise draw + random-window
    discriminator (reference models/style_melgan.py:324-337) — runs a
    sharded G+D step deterministically with decorrelated per-device
    noise/window streams (asserted inside _dryrun_family)."""
    import sys

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from parallelwavegan_tpu.engine.step import fold_step_rng
    from parallelwavegan_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:8])
    axis = mesh.axis_names[0]

    def derive(r):
        k = fold_step_rng(r, jnp.asarray(3), axis)
        return jnp.expand_dims(jax.random.key_data(k), 0)

    keys = np.asarray(
        jax.jit(
            jax.shard_map(
                derive, mesh=mesh, in_specs=(P(),), out_specs=P(axis),
                check_vma=False,
            )
        )(jax.random.key(0))
    )
    assert len({tuple(k.ravel().tolist()) for k in keys}) == len(keys)

    # the same step/seed without an axis is itself deterministic
    a = jax.random.key_data(
        fold_step_rng(jax.random.key(0), jnp.asarray(3), None)
    )
    b = jax.random.key_data(
        fold_step_rng(jax.random.key(0), jnp.asarray(3), None)
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # full-path: the StyleMelGAN sharded train step (determinism +
    # decorrelation asserts live inside _dryrun_family)
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as ge

    ge._dryrun_family(
        "style_melgan_rwd", ge._style_melgan_tiny_config(), mesh, 8,
        equiv="decorrelated",
    )


def test_vq_dead_code_restart():
    """vq_dead_code_restart re-seeds embeddings unused by the batch with
    encoder outputs (the collapse mitigation the reference lacks): after
    one step, dead rows move into the encoder-output cloud, used rows
    follow the gradient, and the vq_codes_used metric reports global
    utilization. Runs on the 8-device mesh to pin the psum/pmean
    (replicated-params) semantics."""
    import jax.numpy as jnp

    from parallelwavegan_tpu.engine.build import (
        example_batch, init_train_state,
    )
    from parallelwavegan_tpu.engine.criterion import build_criterion
    from parallelwavegan_tpu.engine.step import build_steps
    from parallelwavegan_tpu.parallel.mesh import (
        make_mesh, replicate, shard_batch,
    )

    config = {
        "sampling_rate": 8000, "hop_size": 64, "num_mels": 16,
        "batch_max_steps": 1024, "batch_size": 8,
        "generator_type": "VQVAE",
        "generator_params": {
            "in_channels": 1, "out_channels": 1,
            "num_embeds": 32, "embed_dim": 16,
            "encoder_conf": {
                "out_channels": 16, "downsample_scales": [4, 4],
                "max_downsample_channels": 32, "channels": 8,
            },
            "decoder_conf": {
                "in_channels": 16, "upsample_scales": [4, 4],
                "channels": 16, "stacks": 1,
            },
        },
        "discriminator_type": "MelGANDiscriminator",
        "discriminator_params": {
            "channels": 8, "downsample_scales": [4],
            "max_downsample_channels": 32,
        },
        "stft_loss_params": {
            "fft_sizes": [64], "hop_sizes": [16], "win_lengths": [48],
        },
        "lambda_adv": 1.0,
        "generator_optimizer_params": {"lr": 1e-4},
        "discriminator_optimizer_params": {"lr": 1e-4},
        "generator_scheduler_params": {"step_size": 100, "gamma": 0.5},
        "discriminator_scheduler_params": {"step_size": 100, "gamma": 0.5},
        "generator_grad_norm": -1, "discriminator_grad_norm": -1,
        "vq_dead_code_restart": True,
        # prob 1.0 makes the one-step semantics deterministic for the
        # asserts below; the product default (0.1) lets dead codes
        # persist ~10 steps before re-seeding
        "vq_restart_prob": 1.0,
    }
    mesh = make_mesh(jax.devices()[:8])
    rng = jax.random.key(0)
    state, g, d, og, od = init_train_state(config, rng)
    emb0 = np.asarray(
        jax.device_get(state.params_g["codebook"]["embedding"])
    )
    criterion = build_criterion(config)
    factory, _ = build_steps(config, g, d, criterion, og, od, mesh=mesh)
    step = factory(True, True, True)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, example_batch(config, batch_size=8))
    new_state, metrics = step(state, batch, rng)

    used = float(metrics["vq_codes_used"])
    assert 1 <= used <= 32
    emb1 = np.asarray(
        jax.device_get(new_state.params_g["codebook"]["embedding"])
    )
    # the tiny U(+-1/K) init guarantees dead codes on real-scale encoder
    # outputs; restarted rows must leave the +-1/K init ball entirely
    moved = np.abs(emb1).max(axis=1) > 2.0 / 32
    assert moved.sum() >= 32 - used, (moved.sum(), used)
    # params stay replicated across the mesh (single logical value)
    assert np.isfinite(emb1).all()
    # a second step still runs (restarted rows participate immediately)
    new_state2, m2 = step(new_state, batch, rng)
    assert float(m2["vq_codes_used"]) >= used
