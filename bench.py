"""Benchmark: HiFiGAN V1 batched copy-synthesis throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: synthesized audio-seconds per wall-second per chip (22.05 kHz,
BASELINE.json), bf16 inference (the idiomatic TPU serving dtype), batch=128
x 5.9 s utterances. Baseline: the reference publishes no HiFiGAN RTF; the
closest published number is MelGAN decode RTF 0.002 on TITAN V (~500
audio-s/s, reference README.md:169-171; HiFiGAN V1 is a strictly heavier
generator) — used as the conservative bar (BASELINE.md).

Timing note: each timed iteration ends in a device->host scalar readback —
block_until_ready alone under-reports on this platform's tunneled TPU.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from parallelwavegan_tpu.models import HiFiGANGenerator

    sr = 22050
    hop = 256
    # HiFiGAN V1 (reference egs/ljspeech/voc1/conf/hifigan.v1.yaml)
    generator = HiFiGANGenerator(
        in_channels=80,
        channels=512,
        upsample_scales=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    )
    rng = jax.random.key(0)
    batch, frames = 128, 512
    dtype = jnp.bfloat16
    mels = [
        jnp.asarray(
            np.random.default_rng(s).standard_normal((batch, frames, 80)),
            dtype=dtype,
        )
        for s in range(5)
    ]
    variables = generator.init(
        {"params": rng}, mels[0][:1, :8].astype(jnp.float32)
    )
    variables = jax.tree.map(lambda x: x.astype(dtype), variables)

    # reduce on device; the scalar readback is the synchronization point
    fwd = jax.jit(lambda v, c: jnp.sum(generator.apply(v, c)))
    float(fwd(variables, mels[0]))  # compile + warm up

    tic = time.perf_counter()
    for m in mels[1:]:
        float(fwd(variables, m))
    elapsed = time.perf_counter() - tic
    n_iters = len(mels) - 1

    audio_seconds = n_iters * batch * frames * hop / sr
    value = audio_seconds / elapsed
    baseline = 500.0  # MelGAN TITAN V RTF 0.002 -> 500 audio-s/s
    print(
        json.dumps(
            {
                "metric": "hifigan_v1_synthesis_audio_seconds_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "audio-s/s",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
