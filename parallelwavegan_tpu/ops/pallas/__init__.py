"""Pallas TPU kernels for the hot ops (SURVEY.md §7.9), each behind a
flag with an XLA fallback of identical math."""

from parallelwavegan_tpu.ops.pallas.wavenet_stack import (  # noqa: F401
    fuse_wavenet_stack_params,
    wavenet_stack,
    wavenet_stack_reference,
)
