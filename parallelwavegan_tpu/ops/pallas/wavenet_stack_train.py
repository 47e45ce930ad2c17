"""Trainable fused WaveNet stack: custom-VJP around the Pallas kernel.

The inference kernel (wavenet_stack.py) has no gradient, so training ran the
30-layer stack as per-layer XLA convs — 73 ms forward for the PWG v1 batch
(6 x 25600 samples f32) where the fused kernel does the same math in ~8 ms:
at 64 residual channels every per-layer XLA op round-trips HBM with 2x lane
padding. This module adds the backward Pallas kernel and wires both into
`jax.custom_vjp`, giving the training path the same fusion.

Forward saves each layer's input window (`save_inputs=True` in
wavenet_stack.py) in the matmul dtype — 2 bytes/sample/layer in mixed
precision (4 in f32 training), far cheaper than recomputing the stack in
the backward pass, and exactly the values the forward matmuls consumed
(the f32 residual state is cast to the matmul dtype before every tap
contraction). The backward kernel re-derives
the gate pre-activations from the stored inputs (one extra matmul pair per
layer) instead of storing the (T, G) gate tensor.

Backward math per layer l (reverse order), cotangents dxn = d/dx_{l+1},
dskip = d/d(skip_sum) (central chunk only):
    recompute: z = [x(t-d)|x|x(t+d)] @ Wt + c @ Wa + bt       (stored x)
               ta = tanh(z[:, :R]); sig = 0.5*(1 + tanh(z[:, R:]))
               g = ta * sig     (Wt/bt/Wa carry the 0.5 half-angle
                                 pre-scale on the sigmoid half, identical
                                 to the forward kernel)
    dxraw = in_seq ? dxn : 0                (forward zeroed out-of-sequence)
    dso   = [dskip | dxraw * sqrt(.5)]
    dg    = dso @ Wso^T
    dz    = [dg * sig * (1 - ta^2) | dg * ta * 0.5 * (1 - ts^2)]
    dWt  += xcat^T @ dz   dbt += sum dz   dWa += c^T @ dz
    dWso += g^T @ dso     dbso += sum dso
    dc   += dz @ Wa^T
    dx    = dxraw * sqrt(.5) + scatter(dz @ Wt^T taps at t -+ d)

Per-window weight grads are written to per-(window, layer) output blocks and
summed outside the kernel (grid order makes in-kernel accumulation across
windows illegal); dx/dc windows are overlap-added outside.

Reference semantics: /root/reference/parallel_wavegan/layers/
residual_block.py:43-139 (the block whose gradient this reproduces).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallelwavegan_tpu.ops.pallas.wavenet_stack import (
    _overlapping_windows,
    _round_up,
    wavenet_stack,
    wavenet_stack_reference,
)


def _stack_bwd_kernel(
    dil_ref,  # scalar-prefetch (L,) int32 dilations (original layer order)
    xs_ref, c_ref, wt_ref, bt_ref, wa_ref, wso_ref,
    dxout_ref, dskip_ref,
    dx_ref, dc_ref, dwt_ref, dbt_ref, dwa_ref, dwso_ref, dbso_ref,
    dprev,  # f32 scratch (TB, R): running dx cotangent across layer steps
    xsc,   # f32 scratch (pad + TB + pad, R): zero-edged layer input
    dc0,   # f32 scratch (pad + TB + pad, R): zero-edged left-tap dz @ Wt^T
    dc2,   # f32 scratch (pad + TB + pad, R): zero-edged right-tap dz @ Wt^T
    *, halo, chunk, pad, n_chunks, n_layers, t_len,
):
    R = dx_ref.shape[-1]
    tb = dx_ref.shape[1]
    SR = wso_ref.shape[-1]
    S = SR - R
    f32 = jnp.float32
    mm = wt_ref.dtype
    lrev = pl.program_id(1)
    layer = n_layers - 1 - lrev
    k = pl.program_id(0) % n_chunks
    sqrt_half = math.sqrt(0.5)

    @pl.when(lrev == 0)
    def _():
        # only the central chunk of x_out is exposed; halo cotangent is 0
        dprev[pl.ds(0, halo)] = jnp.zeros((halo, R), f32)
        dprev[pl.ds(halo, chunk)] = dxout_ref[0].astype(f32)
        dprev[pl.ds(halo + chunk, halo)] = jnp.zeros((halo, R), f32)
        dc_ref[0] = jnp.zeros_like(dc_ref[0])
        # zero edges persist: only the central region is ever overwritten
        for ref in (dc0, dc2, xsc):
            ref[pl.ds(0, pad)] = jnp.zeros((pad, R), f32)
            ref[pl.ds(pad + tb, pad)] = jnp.zeros((pad, R), f32)

    d = dil_ref[layer]
    # zero-edged copy of the stored layer input for the +-d tap reads
    xsc[pl.ds(pad, tb)] = xs_ref[0, 0].astype(f32)
    x = xsc[pl.ds(pad, tb)]
    sr = xsc[pl.ds(pad - d, tb)]
    sl = xsc[pl.ds(pad + d, tb)]
    c = c_ref[0]

    # recompute gate pre-activations (same math as the forward kernel)
    xcat = jnp.concatenate([sr, x, sl], axis=-1).astype(mm)
    z = jnp.dot(xcat, wt_ref[0], preferred_element_type=f32)
    z += jnp.dot(c, wa_ref[0], preferred_element_type=f32)
    z += bt_ref[0, 0].astype(f32)
    t = jnp.tanh(z)
    ta = t[:, :R]
    ts = t[:, R:]
    sig = 0.5 * (1.0 + ts)
    g = ta * sig

    # incoming cotangents; mask where the forward zeroed out-of-sequence
    pos = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0) + k * chunk - halo
    in_seq = jnp.logical_and(pos >= 0, pos < t_len)
    dxraw = jnp.where(in_seq, dprev[...], 0.0)
    dsk = jnp.concatenate(
        [jnp.zeros((halo, S), f32), dskip_ref[0].astype(f32),
         jnp.zeros((halo, S), f32)],
        axis=0,
    )
    dso = jnp.concatenate([dsk, dxraw * sqrt_half], axis=-1)  # (tb, SR)

    dg = jax.lax.dot_general(
        dso.astype(mm), wso_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # (tb, R)
    da = dg * sig * (1.0 - ta * ta)
    ds = dg * ta * (0.5 * (1.0 - ts * ts))
    dz = jnp.concatenate([da, ds], axis=-1)  # (tb, G) f32
    dzm = dz.astype(mm)

    # weight/bias grads for this (window, layer) block; summed outside
    dwt_ref[0, 0] = jax.lax.dot_general(
        xcat, dzm, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ).astype(dwt_ref.dtype)
    dbt_ref[0, 0, 0] = jnp.sum(dz, axis=0).astype(dbt_ref.dtype)
    dwa_ref[0, 0] = jax.lax.dot_general(
        c, dzm, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ).astype(dwa_ref.dtype)
    dwso_ref[0, 0] = jax.lax.dot_general(
        g.astype(mm), dso.astype(mm), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(dwso_ref.dtype)
    dbso_ref[0, 0, 0] = jnp.sum(dso, axis=0).astype(dbso_ref.dtype)

    dc_ref[0] += jax.lax.dot_general(
        dzm, wa_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=f32
    ).astype(dc_ref.dtype)

    # next layer's dx: residual path + the three conv-tap transposes.
    # tap j reads x(t + (j-1)*d) in the forward, so its transpose scatters
    # dz contributions to x(u) from position u - (j-1)*d — realized here as
    # dynamic-offset *reads* of a zero-edged scratch (Mosaic supports
    # unaligned dynamic slices only as reads of 32-bit data).
    dxcat = jax.lax.dot_general(
        dzm, wt_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=f32
    )  # (tb, 3R)
    dc0[pl.ds(pad, tb)] = dxcat[:, :R]
    dc2[pl.ds(pad, tb)] = dxcat[:, 2 * R :]
    dprev[...] = (
        dxraw * sqrt_half
        + dc0[pl.ds(pad + d, tb)]
        + dxcat[:, R : 2 * R]
        + dc2[pl.ds(pad - d, tb)]
    )

    @pl.when(lrev == n_layers - 1)
    def _():
        dx_ref[0] = dprev[...].astype(dx_ref.dtype)


def _overlap_add(win: jnp.ndarray, B: int, n_chunks: int, chunk: int,
                 halo: int, T: int) -> jnp.ndarray:
    """(B*n_chunks, chunk+2*halo, C) window grads -> (B, T, C)."""
    tb = chunk + 2 * halo
    P = n_chunks * chunk + 2 * halo
    win = win.reshape(B, n_chunks, tb, win.shape[-1])
    out = jnp.zeros((B, P, win.shape[-1]), win.dtype)
    for k in range(n_chunks):
        out = out.at[:, k * chunk : k * chunk + tb].add(win[:, k])
    return out[:, halo : halo + T]


def _gate_scale(w: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    G = w["w_tap"].shape[-1]
    R = w["w_so"].shape[-2]
    return jnp.concatenate(
        [jnp.ones((R,), w["w_tap"].dtype),
         jnp.full((G - R,), 0.5, w["w_tap"].dtype)]
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def wavenet_stack_train(
    x: jnp.ndarray,
    c: jnp.ndarray,
    w: Dict[str, jnp.ndarray],
    dilations: Tuple[int, ...],
    chunk: int = 4096,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """wavenet_stack with a Pallas backward pass (use in jitted train steps).

    Same contract as wavenet_stack(x, c, w, dilations): returns
    (x_out (B, T, R), skip_sum (B, T, S) f32). Differentiable in x, c, w.
    """
    return wavenet_stack(x, c, w, dilations, chunk=chunk, interpret=interpret)


def _train_fwd(x, c, w, dilations, chunk, interpret):
    xo, sk, xs = wavenet_stack(
        x, c, w, dilations, chunk=chunk, interpret=interpret,
        save_inputs=True,
    )
    return (xo, sk), (c, w, xs, jnp.zeros((0,), x.dtype))


def _train_bwd(dilations, chunk, interpret, res, cot):
    c, w, xs, x_proto = res
    dxo, dsk = cot
    B, T, R = dxo.shape
    x_dtype = x_proto.dtype
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
    W = B * n_chunks
    f32 = jnp.float32

    # central-chunk cotangent windows (non-overlapping; zero-pad to t_pad)
    def central(a):
        a = jnp.pad(a.astype(f32), ((0, 0), (0, t_pad - T), (0, 0)))
        return a.reshape(W, chunk, a.shape[-1])

    dxo_w = central(dxo)
    dsk_w = central(dsk)
    cw = _overlapping_windows(
        jnp.pad(c, ((0, 0), (halo, halo + t_pad - T), (0, 0))),
        halo, chunk, n_chunks,
    )

    # same half-angle pre-scale as the forward kernel
    s = _gate_scale(w)
    wt = (w["w_tap"] * s).reshape(L, 3 * R, G)
    bt = (w["b_tap"] * s)[:, None]
    wa = w["w_aux"] * s
    mm_dtype = wt.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W, L),
        in_specs=[
            pl.BlockSpec((1, 1, tb, R),
                         lambda i, l, *_: (i, L - 1 - l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, A), lambda i, l, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * R, G),
                         lambda i, l, *_: (L - 1 - l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda i, l, *_: (L - 1 - l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, G), lambda i, l, *_: (L - 1 - l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, SR), lambda i, l, *_: (L - 1 - l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, R), lambda i, l, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, S), lambda i, l, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tb, R), lambda i, l, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, A), lambda i, l, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * R, G),
                         lambda i, l, *_: (i, L - 1 - l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, G),
                         lambda i, l, *_: (i, L - 1 - l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, A, G),
                         lambda i, l, *_: (i, L - 1 - l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R, SR),
                         lambda i, l, *_: (i, L - 1 - l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, SR),
                         lambda i, l, *_: (i, L - 1 - l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, R), f32),
            pltpu.VMEM((pad + tb + pad, R), f32),
            pltpu.VMEM((pad + tb + pad, R), f32),
            pltpu.VMEM((pad + tb + pad, R), f32),
        ],
    )
    flops_per_t = 2 * L * (2 * (3 * R * G) + 2 * (A * G) + 2 * (R * SR)
                           + R * SR + R * G)
    out = pl.pallas_call(
        partial(
            _stack_bwd_kernel,
            halo=halo,
            chunk=chunk,
            pad=pad,
            n_chunks=n_chunks,
            n_layers=L,
            t_len=T,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((W, tb, R), f32),
            jax.ShapeDtypeStruct((W, tb, A), f32),
            jax.ShapeDtypeStruct((W, L, 3 * R, G), f32),
            jax.ShapeDtypeStruct((W, L, 1, G), f32),
            jax.ShapeDtypeStruct((W, L, A, G), f32),
            jax.ShapeDtypeStruct((W, L, R, SR), f32),
            jax.ShapeDtypeStruct((W, L, 1, SR), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=W * tb * flops_per_t,
            bytes_accessed=W * tb * (2 * R + 2 * A + L * R) * 4,
            transcendentals=W * tb * 2 * L * R,
        ),
        interpret=interpret,
    )(
        jnp.asarray(dilations, jnp.int32),
        xs, cw.astype(mm_dtype), wt, bt, wa, w["w_so"],
        dxo_w, dsk_w,
    )
    dxw, dcw, dwt, dbt, dwa, dwso, dbso = out
    dx = _overlap_add(dxw, B, n_chunks, chunk, halo, T).astype(x_dtype)
    dc = _overlap_add(dcw, B, n_chunks, chunk, halo, T).astype(c.dtype)

    sf = _gate_scale(w).astype(f32)
    dw = {
        # undo the pre-scale: y = f(w*s) => dw = s * d(w*s)
        "w_tap": (jnp.sum(dwt, axis=0).reshape(L, 3, R, G) * sf).astype(
            w["w_tap"].dtype
        ),
        "b_tap": (jnp.sum(dbt, axis=0)[:, 0] * sf).astype(w["b_tap"].dtype),
        "w_aux": (jnp.sum(dwa, axis=0) * sf).astype(w["w_aux"].dtype),
        "w_so": jnp.sum(dwso, axis=0).astype(w["w_so"].dtype),
        "b_so": jnp.sum(dbso, axis=0)[:, 0].astype(w["b_so"].dtype),
    }
    return dx, dc, dw


wavenet_stack_train.defvjp(_train_fwd, _train_bwd)


def wavenet_stack_train_reference(x, c, w, dilations):
    """Differentiable XLA fallback (CPU / multi-device GSPMD paths)."""
    return wavenet_stack_reference(x, c, w, dilations)
