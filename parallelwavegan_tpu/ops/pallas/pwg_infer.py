"""Fused Parallel WaveGAN inference: upsample (XLA) + WaveNet stack (Pallas).

Replaces the per-layer XLA execution of `ParallelWaveGANGenerator.__call__`
with the fused `wavenet_stack` kernel for the 30-layer hot loop; the
upsample network, first conv, and output tail are single cheap matmuls/convs
that stay on the XLA path. Output parity with the flax forward is exact up
to accumulation order (tested in tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from parallelwavegan_tpu.ops.pallas.wavenet_stack import (
    fold_weight_norm,
    fuse_wavenet_stack_params,
    wavenet_stack,
    wavenet_stack_reference,
)
from parallelwavegan_tpu.ops.pallas.wavenet_stack_train import (
    wavenet_stack_train,
)


def supports_fused_inference(gen) -> bool:
    """The kernel covers the reference PWG configuration space that matters:
    kernel_size 3, non-causal, no dropout, conditioned."""
    return (
        gen.kernel_size == 3
        and not gen.use_causal_conv
        and gen.dropout == 0.0
        and gen.aux_channels > 0
        and gen.layers % gen.stacks == 0
    )


def _conv1x1(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    k = fold_weight_norm(p)[0].astype(x.dtype)  # (Cin, Cout)
    y = jnp.dot(x, k, preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def pwg_fused_forward(
    gen,
    variables: Dict[str, Any],
    z: jnp.ndarray,
    c: Optional[jnp.ndarray],
    *,
    group_size: Optional[int] = None,
    chunk: int = 16384,
    use_kernel: bool = True,
    interpret: bool = False,
    trainable: bool = False,
) -> jnp.ndarray:
    """Batched fused forward: z (B, T, 1), c (B, T'+2*ctx, A) -> (B, T, out).

    `gen` is a ParallelWaveGANGenerator module definition (unbound);
    `variables` its params (weight-normed or folded — both handled).
    Groups default to one dilation cycle so every kernel call has the same
    halo (sum of one cycle's dilations).

    trainable=True routes the stack through wavenet_stack_train (the
    custom-VJP kernel pair) so the whole function is differentiable in
    `variables` — use this inside jitted train steps. Everything outside
    the stack (weight-norm folds, upsample net, 1x1 convs) is plain JAX and
    differentiates as usual.
    """
    assert supports_fused_inference(gen), "config not supported by fused path"
    if trainable and (chunk is None or chunk <= 0):
        # auto: even chunks near 6400 (measured best on v5e: bigger chunks
        # spill the backward kernel's VMEM, smaller ones waste halo compute)
        T = z.shape[1]
        n = -(-T // 6656)
        chunk = -(-(-(-T // n)) // 128) * 128
    p = variables["params"]
    if c is not None and gen.upsample_conditional_features:
        up = gen.make_upsample_module()
        c = up.apply({"params": p["upsample_net"]}, c)
        assert c.shape[1] == z.shape[1], (c.shape, z.shape)
    x = _conv1x1(p["first_conv"], z)

    L = gen.layers
    lpc = L // gen.stacks
    dils = [2 ** (i % lpc) for i in range(L)]
    if group_size is None:
        if trainable:
            # per-cycle groups bound the backward kernel's VMEM footprint
            # (temporaries scale with chunk + 2*sum(group dilations))
            group_size = min(lpc, 10)
        else:
            # all layers in ONE kernel call when the halo stays a small
            # fraction of the chunk: one window gather + one skip output
            # instead of one per dilation cycle (938 vs 901 audio-s/s on
            # v5e for PWG v1); per-cycle groups for huge dilations — and
            # for f32, whose per-layer VMEM residency is 2x the bf16
            # serving path's (an all-layer f32 call at chunk 16384 was
            # measured to exceed the 100 MB scoped-vmem limit by ~14 MB
            # on v5e, killing f32 CLI decodes of >1 s utterances)
            one_call = sum(dils) <= chunk // 4 and x.dtype.itemsize <= 2
            group_size = L if one_call else min(lpc, 10)
    skip_total = None
    for g0 in range(0, L, group_size):
        idx = list(range(g0, min(g0 + group_size, L)))
        w = fuse_wavenet_stack_params(p, idx)
        w = jax.tree.map(lambda a: a.astype(x.dtype), w)
        d = tuple(dils[i] for i in idx)
        if not use_kernel:
            x, sk = wavenet_stack_reference(x, c, w, d)
        elif trainable:
            x, sk = wavenet_stack_train(x, c, w, d, chunk, interpret)
        else:
            x, sk = wavenet_stack(x, c, w, d, chunk=chunk, interpret=interpret)
        skip_total = sk if skip_total is None else skip_total + sk

    xs = (skip_total * math.sqrt(1.0 / L)).astype(x.dtype)
    x = jax.nn.relu(xs)
    x = jax.nn.relu(_conv1x1(p["last_conv_0"], x))
    return _conv1x1(p["last_conv_1"], x)
