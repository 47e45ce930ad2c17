"""Every committed recipe config must construct its models, and every debug
config must run one full adversarial train step on the CPU mesh."""

import glob

import pytest
import yaml

import jax

from parallelwavegan_tpu.engine.build import (
    build_models,
    example_batch,
    init_train_state,
)
from parallelwavegan_tpu.engine.criterion import build_criterion
from parallelwavegan_tpu.engine.step import build_steps
from parallelwavegan_tpu.parallel.mesh import make_mesh, replicate, shard_batch

ALL_CONFIGS = sorted(glob.glob("egs/*/*/conf/*.yaml"))
DEBUG_CONFIGS = sorted(glob.glob("egs/synthetic/voc1/conf/*.debug.yaml"))


@pytest.mark.parametrize("path", ALL_CONFIGS)
def test_config_builds_models(path):
    with open(path) as f:
        config = yaml.safe_load(f)
    build_models(config)


@pytest.mark.parametrize("path", DEBUG_CONFIGS)
def test_debug_config_one_train_step(path):
    with open(path) as f:
        config = yaml.safe_load(f)
    rng = jax.random.key(0)
    state, gen, dis, opt_g, opt_d = init_train_state(config, rng)
    criterion = build_criterion(config)
    factory, _ = build_steps(config, gen, dis, criterion, opt_g, opt_d)
    step = factory(True, True, True)
    mesh = make_mesh()
    state = replicate(mesh, state)
    batch = shard_batch(mesh, example_batch(config, batch_size=8))
    new_state, metrics = step(state, batch, rng)
    assert int(new_state.steps) == 1
    for k, v in metrics.items():
        assert float(v) == float(v), f"NaN metric {k} in {path}"
