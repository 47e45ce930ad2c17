"""Training engine: GAN train state, jitted SPMD steps, trainer loop."""

from parallelwavegan_tpu.engine.state import GANTrainState  # noqa: F401
from parallelwavegan_tpu.engine.trainer import Trainer  # noqa: F401
