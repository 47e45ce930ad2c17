"""Utilities: params transforms, config, io, checkpoint import."""

from parallelwavegan_tpu.utils.params import (  # noqa: F401
    count_params,
    fold_weight_norm,
)
