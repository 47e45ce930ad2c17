"""Benchmark: Parallel WaveGAN V1 copy-synthesis throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: synthesized audio-seconds per wall-second per chip (22.05 kHz) for
the reference's eponymous flagship model, Parallel WaveGAN V1 (LJSpeech
config, egs/ljspeech/voc1/conf/parallel_wavegan.v1.yaml), bf16 serving
dtype, batch=32 x 5.9 s utterances, using the fused Pallas WaveNet-stack
kernel (ops/pallas/wavenet_stack.py). Baseline: the reference's published
decode RTF 0.016 on a TITAN V GPU (README.md:148-153) = 62.5 audio-s/s.

`BENCH_MODE=train python bench.py` instead measures full adversarial
training steps/s for the same config (G update + D update, batch 6 x
25600 samples); baseline = the reference's published 400k steps in ~3 days
on a TITAN V (egs/ljspeech/voc1/conf/parallel_wavegan.v1.yaml:4) = 1.54
steps/s.

Timing note: each timed iteration ends in a device->host scalar readback —
block_until_ready alone under-reports on this platform's tunneled TPU.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: first run pays ~2-4 min of remote TPU
    # compilation, later runs (and the driver's) start in seconds
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/parallelwavegan_tpu/xla"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    if os.environ.get("BENCH_MODE") == "train":
        return train_bench()

    from parallelwavegan_tpu.models import ParallelWaveGANGenerator
    from parallelwavegan_tpu.ops.pallas.pwg_infer import pwg_fused_forward

    sr, hop = 22050, 256
    # PWG v1 (reference egs/ljspeech/voc1/conf/parallel_wavegan.v1.yaml)
    generator = ParallelWaveGANGenerator(
        layers=30, stacks=3, residual_channels=64, gate_channels=128,
        skip_channels=64, aux_channels=80, aux_context_window=2,
        upsample_params={"upsample_scales": [4, 4, 4, 4]},
    )
    batch, frames = 32, 512
    dtype = jnp.bfloat16
    rng = jax.random.key(0)
    cs = [
        jnp.asarray(
            np.random.default_rng(s).standard_normal((batch, frames + 4, 80)),
            dtype,
        )
        for s in range(4)
    ]
    z = jnp.asarray(
        np.random.default_rng(9).standard_normal((batch, frames * hop, 1)),
        dtype,
    )
    variables = generator.init(
        {"params": rng},
        z[:1, : hop * 8].astype(jnp.float32),
        cs[0][:1, :12].astype(jnp.float32),
    )
    variables = jax.tree.map(lambda x: x.astype(dtype), variables)

    use_kernel = jax.default_backend() not in ("cpu",)
    fwd = jax.jit(
        lambda v, z, c: jnp.sum(
            pwg_fused_forward(generator, v, z, c, use_kernel=use_kernel)
        )
    )
    float(fwd(variables, z, cs[0]))  # compile + warm up

    # dispatch all iterations asynchronously and read back ONE scalar at the
    # end: a device->host readback through the tunneled TPU costs ~30 ms, so
    # a per-iteration readback would understate throughput by ~10%
    n_iters = 2 * (len(cs) - 1)
    tic = time.perf_counter()
    acc = None
    for c in cs[1:] + cs[1:]:
        s = fwd(variables, z, c)
        acc = s if acc is None else acc + s
    float(acc)
    elapsed = time.perf_counter() - tic

    audio_seconds = n_iters * batch * frames * hop / sr
    value = audio_seconds / elapsed
    baseline = 62.5  # reference PWG decode RTF 0.016 on TITAN V
    print(
        json.dumps(
            {
                "metric": "pwg_v1_synthesis_audio_seconds_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "audio-s/s",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


def train_bench():
    import jax
    import jax.numpy as jnp
    import yaml

    from parallelwavegan_tpu.engine.build import (
        example_batch,
        init_train_state,
    )
    from parallelwavegan_tpu.engine.criterion import build_criterion
    from parallelwavegan_tpu.engine.step import build_steps

    here = os.path.dirname(os.path.abspath(__file__))
    with open(
        os.path.join(
            here, "egs/ljspeech/voc1/conf/parallel_wavegan.v1.yaml"
        )
    ) as f:
        cfg = yaml.safe_load(f)
    rng = jax.random.key(0)
    state, g, d, og, od = init_train_state(cfg, rng)
    criterion = build_criterion(cfg)
    factory, _ = build_steps(cfg, g, d, criterion, og, od)
    step = factory(True, True, True)  # full adversarial G + D step
    batch = {
        k: jnp.asarray(v)
        for k, v in example_batch(cfg, batch_size=cfg["batch_size"]).items()
    }
    state, m = step(state, batch, rng)
    float(m["generator_loss"])  # compile + warm up
    # async dispatch, one readback at the end (see the synthesis bench note)
    n = 8
    tic = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch, rng)
    float(m["generator_loss"])
    elapsed = (time.perf_counter() - tic) / n
    baseline = 400000 / (3 * 86400)  # reference: 400k steps / ~3 days
    value = 1.0 / elapsed
    print(
        json.dumps(
            {
                "metric": "pwg_v1_train_steps_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "steps/s",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
