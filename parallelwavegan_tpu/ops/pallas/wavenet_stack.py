"""Fused WaveNet dilated-gated-residual stack as a Pallas TPU kernel.

The Parallel WaveGAN generator's hot loop is 30 dilated-conv gated residual
blocks over small channel counts (R=64, G=128 — reference
/root/reference/parallel_wavegan/models/parallel_wavegan.py:120-173 and
layers/residual_block.py:43-139). Per-layer XLA execution round-trips every
(B, T, 64) activation through HBM with 2x lane-padding waste (64 < 128
lanes), so the stack is bandwidth-bound at a few percent MXU utilization.

This kernel fuses a *group* of layers (default: one dilation cycle, 10
layers). Grid = (batch*time_chunks, layers): the TPU grid is sequential, so
the residual state lives in a VMEM scratch that persists across the layer
steps, the skip sum accumulates in the output block (which Mosaic keeps in
VMEM while its block index is unchanged), and per-layer weights stream in as
blocks. Each layer is two MXU matmuls (the three conv taps packed into one
K=3R contraction — R=64 alone half-fills the MXU's 128-deep contraction —
plus the aux 1x1), the VPU gate, and one fused skip|out matmul. HBM
activation traffic drops from one round-trip per layer to one per group.

Layers are grid steps (not an unrolled Python loop) because Mosaic
stack-allocates every unrolled iteration's temporaries — 10 unrolled layers
need ~23 MB of VMEM; as grid steps the same kernel needs one layer's worth.

Chunking: time is split into halo'd overlapping windows (gathered outside
the kernel so the grid pipeline double-buffers the DMAs). The conv taps read
x[t±d] via dynamic slices of a zero-edged scratch `xpad`; the zero edges
reproduce conv zero padding at window borders, and the out-of-sequence part
of each window is re-zeroed after every layer (each conv zero-pads its own
input at the *sequence* boundary, so halo garbage must not accumulate).

Math per layer (identical to WaveNetResidualBlock with k=3, non-causal):
    z    = [x[t-d] | x | x[t+d]] @ Wc + bc + c @ Wa       # (TB, G)
    g    = tanh(z[:, :R]) * sigmoid(z[:, R:])             # (TB, R)
    skip += g @ Ws + bs                                   # (TB, S)
    x    = (g @ Wo + bo + x) * sqrt(0.5)                  # (TB, R)
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fold_weight_norm(p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Fold (kernel_v, kernel_g) -> kernel = v * g / ||v|| (per out channel,
    matching torch weight_norm dim=0; see layers/common.py)."""
    if "kernel" in p:
        return p["kernel"]
    v = p["kernel_v"]
    g = p["kernel_g"]
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
    return v * (g / jnp.maximum(norm, 1e-12))


def fuse_wavenet_stack_params(
    params: Dict, layer_indices: Sequence[int],
    prefix: str = "conv_layers_",
) -> Dict[str, jnp.ndarray]:
    """Stack one layer-group's folded weights into the kernel's layout.

    Returns dict with:
      w_tap (L, 3, R, G) conv taps, b_tap (L, G),
      w_aux (L, A, G) aux 1x1 (no bias in the reference),
      w_so (L, R, S+R) concat skip|out 1x1, b_so (L, S+R).
    """
    w_tap, b_tap, w_aux, w_so, b_so = [], [], [], [], []
    for i in layer_indices:
        p = params[f"{prefix}{i}"]
        wc = fold_weight_norm(p["conv"])          # (3, R, G)
        assert wc.shape[0] == 3, "fused stack requires kernel_size=3"
        w_tap.append(wc)
        b_tap.append(p["conv"]["bias"])
        w_aux.append(fold_weight_norm(p["conv1x1_aux"])[0])  # (A, G)
        ws = fold_weight_norm(p["conv1x1_skip"])[0]          # (R, S)
        wo = fold_weight_norm(p["conv1x1_out"])[0]           # (R, R)
        w_so.append(jnp.concatenate([ws, wo], axis=-1))
        b_so.append(
            jnp.concatenate([p["conv1x1_skip"]["bias"], p["conv1x1_out"]["bias"]])
        )
    return {
        "w_tap": jnp.stack(w_tap),
        "b_tap": jnp.stack(b_tap),
        "w_aux": jnp.stack(w_aux),
        "w_so": jnp.stack(w_so),
        "b_so": jnp.stack(b_so),
    }


def _shift_right(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """s[t] = x[t-d] with zero fill (zero-padded conv semantics)."""
    z = jnp.zeros((d,) + x.shape[1:], x.dtype)
    return jnp.concatenate([z, x[: x.shape[0] - d]], axis=0)


def _shift_left(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """s[t] = x[t+d] with zero fill."""
    z = jnp.zeros((d,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x[d:], z], axis=0)


def _stack_kernel(
    dil_ref,  # scalar-prefetch (L,) int32 dilations
    x_ref, c_ref, w_tap_ref, b_tap_ref, w_aux_ref, w_so_ref, b_so_ref,
    xout_ref, skip_ref,
    *rest,  # [xs_ref when save_inputs] + xpad scratch
    halo, chunk, pad, n_chunks, n_layers, t_len, out_dtype,
    save_inputs=False,
):
    if save_inputs:
        xs_ref, xpad = rest
    else:
        (xpad,) = rest
    R = x_ref.shape[-1]
    tb = x_ref.shape[1]
    SR = w_so_ref.shape[-1]
    S = SR - R
    f32 = jnp.float32
    mm_dtype = w_tap_ref.dtype
    l = pl.program_id(1)
    k = pl.program_id(0) % n_chunks

    @pl.when(l == 0)
    def _():
        # x state is kept f32 in scratch: Mosaic supports *unaligned dynamic*
        # sublane slices only for 32-bit data, and the tap reads below slice
        # at pad±dilation. The zero edges reproduce conv zero padding.
        xpad[pl.ds(0, pad)] = jnp.zeros((pad, R), f32)
        xpad[pl.ds(pad, tb)] = x_ref[0].astype(f32)
        xpad[pl.ds(pad + tb, pad)] = jnp.zeros((pad, R), f32)
        skip_ref[0] = jnp.zeros_like(skip_ref[0])

    if save_inputs:
        # stash this layer's input window for the backward kernel
        xs_ref[0, 0] = xpad[pl.ds(pad, tb)].astype(xs_ref.dtype)

    d = dil_ref[l]
    x = xpad[pl.ds(pad, tb)]
    sr = xpad[pl.ds(pad - d, tb)]
    sl = xpad[pl.ds(pad + d, tb)]
    c = c_ref[0]
    # one K=3R matmul for all three conv taps instead of three K=R matmuls:
    # R=64 only half-fills the MXU's 128-deep contraction, so packing the
    # taps into the contraction dim cuts MXU passes ~1.4x (measured)
    xcat = jnp.concatenate([sr, x, sl], axis=-1).astype(mm_dtype)
    z = jnp.dot(xcat, w_tap_ref[0], preferred_element_type=f32)
    z += jnp.dot(c, w_aux_ref[0], preferred_element_type=f32)
    z += b_tap_ref[0, 0].astype(f32)
    # gate via ONE full-width tanh: sigmoid(b) == 0.5*(1 + tanh(b/2)) and the
    # caller pre-scales the sigmoid-half weights by 0.5, so tanh(z) covers
    # both halves in a single 128-lane VPU transcendental instead of two
    # half-width ones (the gate dominates kernel time; 1.45x measured)
    t = jnp.tanh(z)
    g = t[:, :R] * (0.5 * (1.0 + t[:, R:]))
    so = jnp.dot(g.astype(mm_dtype), w_so_ref[0], preferred_element_type=f32)
    so += b_so_ref[0, 0].astype(f32)
    x_new = (so[:, S:] + x) * math.sqrt(0.5)
    # every conv zero-pads its own input at the *sequence* boundary: re-zero
    # the out-of-sequence part of the window so halo garbage can't accumulate
    pos = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0) + k * chunk - halo
    in_seq = jnp.logical_and(pos >= 0, pos < t_len)
    xpad[pl.ds(pad, tb)] = jnp.where(in_seq, x_new, 0.0)
    skip_ref[0] += so[halo : halo + chunk, :S].astype(out_dtype)

    @pl.when(l == n_layers - 1)
    def _():
        xout_ref[0] = xpad[pl.ds(pad + halo, chunk)].astype(xout_ref.dtype)


def _overlapping_windows(x: jnp.ndarray, halo: int, chunk: int, n_chunks: int):
    """(B, Tpad, C) -> (B*n, chunk+2*halo, C) halo'd windows."""
    tb = chunk + 2 * halo
    idx = np.arange(n_chunks)[:, None] * chunk + np.arange(tb)[None, :]
    w = x[:, idx]  # (B, n, TB, C)
    return w.reshape((-1, tb, x.shape[-1]))


@partial(
    jax.jit,
    static_argnames=("dilations", "chunk", "skip_f32", "interpret",
                     "save_inputs"),
)
def wavenet_stack(
    x: jnp.ndarray,
    c: jnp.ndarray,
    w: Dict[str, jnp.ndarray],
    dilations: Tuple[int, ...],
    *,
    chunk: int = 4096,
    skip_f32: bool = True,
    interpret: bool = False,
    save_inputs: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Run a fused group of WaveNet layers.

    x (B, T, R) residual input; c (B, T, A) upsampled conditioning (both any
    float dtype; compute accumulates in f32). Returns (x_out (B, T, R) same
    dtype as x, skip_sum (B, T, S) f32 by default).

    With save_inputs=True additionally returns the per-layer input windows
    xs (B*n_chunks, L, chunk+2*halo, R) in the matmul (weight) dtype — the
    residuals consumed by the backward kernel in wavenet_stack_train.py.
    """
    B, T, R = x.shape
    A = c.shape[-1]
    L = len(dilations)
    G = w["w_tap"].shape[-1]
    SR = w["w_so"].shape[-1]
    S = SR - R
    halo = _round_up(sum(dilations), 128)
    pad = _round_up(max(dilations), 8)
    tb = chunk + 2 * halo
    n_chunks = -(-T // chunk)
    t_pad = n_chunks * chunk

    pad_cfg = ((0, 0), (halo, halo + t_pad - T), (0, 0))
    xw = _overlapping_windows(jnp.pad(x, pad_cfg), halo, chunk, n_chunks)
    cw = _overlapping_windows(jnp.pad(c, pad_cfg[:2] + ((0, 0),)), halo, chunk, n_chunks)

    # fold the half-angle scale of the packed-tanh gate (see kernel) into
    # the sigmoid-half gate weights
    gate_scale = jnp.concatenate(
        [jnp.ones((R,), w["w_tap"].dtype),
         jnp.full((G - R,), 0.5, w["w_tap"].dtype)]
    )
    w_tap = (w["w_tap"] * gate_scale).reshape(L, 3 * R, G)
    w_aux = w["w_aux"] * gate_scale
    b_tap = w["b_tap"] * gate_scale

    skip_dtype = jnp.float32 if skip_f32 else x.dtype
    flops_per_t = 2 * L * (3 * R * G + A * G + R * SR)
    out_specs = [
        pl.BlockSpec((1, chunk, R), lambda i, l, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk, S), lambda i, l, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B * n_chunks, chunk, R), x.dtype),
        jax.ShapeDtypeStruct((B * n_chunks, chunk, S), skip_dtype),
    ]
    if save_inputs:
        out_specs.append(
            pl.BlockSpec((1, 1, tb, R), lambda i, l, *_: (i, l, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        # store the saved inputs in the MATMUL dtype, not f32: the forward
        # casts the f32 residual state to mm_dtype before every tap matmul,
        # so post-cast values reproduce the backward's matmul inputs
        # EXACTLY while halving the largest HBM stream of the train step
        # (mixed precision: measured ~10 GB/step -> ~5 on PWG v1,
        # docs/BENCHMARKS.md training roofline)
        out_shape.append(
            jax.ShapeDtypeStruct(
                (B * n_chunks, L, tb, R), w["w_tap"].dtype
            )
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * n_chunks, L),
        in_specs=[
            pl.BlockSpec((1, tb, R), lambda i, l, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, A), lambda i, l, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * R, G), lambda i, l, *_: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda i, l, *_: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, G), lambda i, l, *_: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, SR), lambda i, l, *_: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SR), lambda i, l, *_: (l, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((pad + tb + pad, R), jnp.float32)],
    )
    out = pl.pallas_call(
        partial(
            _stack_kernel,
            halo=halo,
            chunk=chunk,
            pad=pad,
            n_chunks=n_chunks,
            n_layers=L,
            t_len=T,
            out_dtype=skip_dtype,
            save_inputs=save_inputs,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * n_chunks * tb * flops_per_t,
            bytes_accessed=B * n_chunks * tb * (R + A) * x.dtype.itemsize,
            transcendentals=B * n_chunks * tb * 2 * L * R,
        ),
        interpret=interpret,
    )(
        jnp.asarray(dilations, jnp.int32),
        xw, cw, w_tap, b_tap[:, None], w_aux, w["w_so"], w["b_so"][:, None],
    )
    x_out = out[0].reshape(B, t_pad, R)[:, :T]
    skip = out[1].reshape(B, t_pad, S)[:, :T]
    if save_inputs:
        return x_out, skip, out[2]
    return x_out, skip


def _layer_math_reference(x, c, w, i, dilation, R):
    """One gated residual layer on the full signal (XLA path)."""
    f32 = jnp.float32
    d = dilation
    z = jnp.dot(x, w["w_tap"][i, 1], preferred_element_type=f32)
    z += jnp.dot(_shift_right(x, d), w["w_tap"][i, 0], preferred_element_type=f32)
    z += jnp.dot(_shift_left(x, d), w["w_tap"][i, 2], preferred_element_type=f32)
    z += jnp.dot(c, w["w_aux"][i], preferred_element_type=f32)
    z += w["b_tap"][i].astype(f32)
    g = jnp.tanh(z[:, :R]) * jax.nn.sigmoid(z[:, R:])
    so = jnp.dot(g.astype(x.dtype), w["w_so"][i], preferred_element_type=f32)
    so += w["b_so"][i].astype(f32)
    S = so.shape[-1] - R
    skip = so[:, :S]
    x_new = ((so[:, S:] + x.astype(f32)) * math.sqrt(0.5)).astype(x.dtype)
    return x_new, skip


def wavenet_stack_reference(
    x: jnp.ndarray,
    c: jnp.ndarray,
    w: Dict[str, jnp.ndarray],
    dilations: Tuple[int, ...],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA fallback with identical math on the full (unchunked) signal."""
    B, T, R = x.shape

    def per_item(xb, cb):
        xi, skip_acc = xb, None
        for i, d in enumerate(dilations):
            xi, skip = _layer_math_reference(xi, cb, w, i, d, R)
            skip_acc = skip if skip_acc is None else skip_acc + skip
        return xi, skip_acc

    return jax.vmap(per_item)(x, c)
