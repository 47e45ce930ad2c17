"""GAN training state (both networks + both optimizers), a single pytree.

The logical contents mirror the reference checkpoint payload
(/root/reference/parallel_wavegan/bin/train.py:118-150): generator and
discriminator params, both optimizer states, the step counter. Extra variable
collections (spectral-norm u vectors) ride along in extra_d/extra_g.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct


class GANTrainState(struct.PyTreeNode):
    steps: jnp.ndarray
    params_g: Any
    extra_g: Dict[str, Any]
    opt_g: Any
    params_d: Any
    extra_d: Dict[str, Any]
    opt_d: Any
    # exponential moving average of params_g (config generator_ema_decay>0;
    # None when disabled). A standard GAN-vocoder stabilizer the reference
    # lacks; serving can select it via load_model(use_ema=True) /
    # decode --use-ema. Updated after each generator step in engine.step.
    ema_g: Any = None
