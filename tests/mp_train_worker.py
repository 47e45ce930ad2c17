"""Worker for the multi-process data-parallel training parity test.

Launched by tests/test_tooling.py via parallelwavegan_tpu.distributed.launch
(the reference-launcher analogue, /root/reference/parallel_wavegan/
distributed/launch.py:116-171 + bin/train.py:1078-1082): each of the two OS
processes owns 4 virtual CPU devices, joins the 8-device global mesh through
``init_distributed`` (jax.distributed, gloo CPU collectives), runs N full
adversarial GAN train steps over its local half of the global batch, and
rank 0 dumps the final metrics + a param checksum as JSON. The test asserts
these equal the single-process 8-device run of the same config — the only
leg of the distributed story that a single pytest process cannot cover.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from parallelwavegan_tpu.engine.build import (  # noqa: E402
    example_batch,
    init_train_state,
)
from parallelwavegan_tpu.engine.criterion import build_criterion  # noqa: E402
from parallelwavegan_tpu.engine.step import build_steps  # noqa: E402
from parallelwavegan_tpu.parallel.mesh import (  # noqa: E402
    init_distributed,
    make_mesh,
    replicate,
    shard_batch,
)

CONFIG = {
    "generator_type": "ParallelWaveGANGenerator",
    "generator_params": {
        "layers": 4,
        "stacks": 2,
        "residual_channels": 8,
        "gate_channels": 16,
        "skip_channels": 8,
        "aux_channels": 20,
        "aux_context_window": 0,
        "upsample_params": {"upsample_scales": [4, 4]},
    },
    "discriminator_type": "ParallelWaveGANDiscriminator",
    "discriminator_params": {"layers": 3, "conv_channels": 8},
    "stft_loss_params": {
        "fft_sizes": [64],
        "hop_sizes": [16],
        "win_lengths": [32],
        "window": "hann",
    },
    "lambda_adv": 4.0,
    "batch_size": 8,
    "batch_max_steps": 512,
    "hop_size": 16,
    "num_mels": 20,
    "generator_optimizer_type": "RAdam",
    "generator_optimizer_params": {"lr": 0.001},
    "discriminator_optimizer_type": "RAdam",
    "discriminator_optimizer_params": {"lr": 0.0005},
    "generator_grad_norm": 10,
    "discriminator_grad_norm": 1,
}

N_STEPS = 3


def global_batch(step: int):
    b = example_batch(CONFIG, batch_size=CONFIG["batch_size"])
    # vary per step deterministically
    return {k: v + 0.01 * step for k, v in b.items()}


def run(local_slice=None):
    """local_slice: (start, stop) rows of the global batch this process
    feeds to shard_batch; None = single-process (full batch)."""
    mesh = make_mesh()
    state, g, d, og, od = init_train_state(CONFIG, jax.random.key(0))
    criterion = build_criterion(CONFIG)
    factory, _ = build_steps(CONFIG, g, d, criterion, og, od, mesh=mesh)
    step_fn = factory(True, True, True)
    state = replicate(mesh, state)
    rng = jax.random.key(1)
    metrics = None
    for i in range(N_STEPS):
        b = global_batch(i)
        if local_slice is not None:
            b = {k: v[local_slice[0]:local_slice[1]] for k, v in b.items()}
        batch = shard_batch(mesh, b)
        state, metrics = step_fn(state, batch, rng)
    out = {k: float(v) for k, v in metrics.items()}
    out["param_sum"] = float(
        sum(
            jnp.sum(jnp.abs(x.astype(jnp.float64)))
            for x in jax.tree_util.tree_leaves(state.params_g)
        )
    )
    return out


def main():
    init_distributed()
    rank = jax.process_index()
    nproc = jax.process_count()
    per = CONFIG["batch_size"] // nproc
    out = run((rank * per, (rank + 1) * per))
    if rank == 0:
        path = sys.argv[1]
        with open(path, "w") as f:
            json.dump(out, f)
    # all processes must stay alive until rank 0 has written (collectives)
    jax.effects_barrier()


if __name__ == "__main__":
    main()
