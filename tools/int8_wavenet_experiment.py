#!/usr/bin/env python3
"""int8 experiment for the fused PWG WaveNet serving kernel (round-5
VERDICT item: "int8 the PWG fused serving kernel — measured attempt").

The serving kernel (ops/pallas/wavenet_stack.py) is compute-bound at
batch 32 (docs/BENCHMARKS.md), so precision looks like the remaining
lever on the 950 audio-s/s flagship number. But its own design notes say
the VPU tanh gate dominates kernel time — if true, doubling the MXU rate
with int8 buys little. This experiment measures, on the real chip:

  1. baseline      — the product bf16 kernel as-is
  2. gate=mul      — tanh/sigmoid replaced by a plain product (WRONG math;
                     purely a timing bound on what eliminating every
                     transcendental could save -> upper-bounds ANY
                     precision/gating optimization of the matmuls+gate)
  3. int8 taps     — w_tap pre-quantized int8 (per-layer symmetric),
                     in-kernel activation quantization of the packed tap
                     window (round/clip on the VPU), int32 MXU
                     accumulation, f32 rescale; aux/skip/out matmuls stay
                     bf16 (their K dims are 80/64 — the small-C regime
                     the round-4 mrf_stage post-mortem showed int8 loses
                     on). Reports wall time AND output SNR vs the f32
                     XLA reference.

Run on the TPU chip:  python tools/int8_wavenet_experiment.py
Writes one JSON line per measurement (bench.py conventions).
"""

import json
import math
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from parallelwavegan_tpu.ops.pallas.wavenet_stack import (  # noqa: E402
    _overlapping_windows,
    _round_up,
    wavenet_stack,
    wavenet_stack_reference,
)


def _variant_kernel(
    dil_ref, x_ref, c_ref, w_tap_ref, b_tap_ref, w_aux_ref, w_so_ref,
    b_so_ref, s_tap_ref,
    xout_ref, skip_ref, xpad,
    *, halo, chunk, pad, n_chunks, n_layers, t_len, gate, int8_taps,
):
    """The product kernel's math with two experiment knobs (see module
    docstring). Structure mirrors ops/pallas/wavenet_stack._stack_kernel."""
    R = x_ref.shape[-1]
    tb = x_ref.shape[1]
    SR = w_so_ref.shape[-1]
    S = SR - R
    f32 = jnp.float32
    l = pl.program_id(1)
    k = pl.program_id(0) % n_chunks

    @pl.when(l == 0)
    def _():
        xpad[pl.ds(0, pad)] = jnp.zeros((pad, R), f32)
        xpad[pl.ds(pad, tb)] = x_ref[0].astype(f32)
        xpad[pl.ds(pad + tb, pad)] = jnp.zeros((pad, R), f32)
        skip_ref[0] = jnp.zeros_like(skip_ref[0])

    d = dil_ref[l]
    x = xpad[pl.ds(pad, tb)]
    sr = xpad[pl.ds(pad - d, tb)]
    sl = xpad[pl.ds(pad + d, tb)]
    c = c_ref[0]
    xcat = jnp.concatenate([sr, x, sl], axis=-1)
    if int8_taps:
        inv_s = s_tap_ref[l, 0]  # 1/activation_scale, f32 scalar per layer
        xq = jnp.clip(jnp.round(xcat * inv_s), -127, 127).astype(jnp.int8)
        zi = jnp.dot(xq, w_tap_ref[0], preferred_element_type=jnp.int32)
        z = zi.astype(f32) * s_tap_ref[l, 1]  # act_scale * w_scale
    else:
        z = jnp.dot(
            xcat.astype(w_so_ref.dtype), w_tap_ref[0],
            preferred_element_type=f32,
        )
    z += jnp.dot(c, w_aux_ref[0], preferred_element_type=f32)
    z += b_tap_ref[0, 0].astype(f32)
    if gate == "tanh":
        t = jnp.tanh(z)
        g = t[:, :R] * (0.5 * (1.0 + t[:, R:]))
    else:  # timing bound only: no transcendentals
        g = z[:, :R] * z[:, R:]
    so = jnp.dot(
        g.astype(w_so_ref.dtype), w_so_ref[0], preferred_element_type=f32
    )
    so += b_so_ref[0, 0].astype(f32)
    x_new = (so[:, S:] + x) * math.sqrt(0.5)
    pos = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0) + k * chunk - halo
    in_seq = jnp.logical_and(pos >= 0, pos < t_len)
    xpad[pl.ds(pad, tb)] = jnp.where(in_seq, x_new, 0.0)
    skip_ref[0] += so[halo : halo + chunk, :S].astype(skip_ref.dtype)

    @pl.when(l == n_layers - 1)
    def _():
        xout_ref[0] = xpad[pl.ds(pad + halo, chunk)].astype(xout_ref.dtype)


@partial(jax.jit, static_argnames=("dilations", "chunk", "gate",
                                   "int8_taps"))
def variant_stack(x, c, w, s_tap, dilations, *, chunk=4096, gate="tanh",
                  int8_taps=False):
    B, T, R = x.shape
    A = c.shape[-1]
    L = len(dilations)
    G = w["w_tap"].shape[-1] if not int8_taps else w["w_tap_q"].shape[-1]
    SR = w["w_so"].shape[-1]
    S = SR - R
    halo = _round_up(sum(dilations), 128)
    pad = _round_up(max(dilations), 8)
    tb = chunk + 2 * halo
    n_chunks = -(-T // chunk)
    t_pad = n_chunks * chunk
    pad_cfg = ((0, 0), (halo, halo + t_pad - T), (0, 0))
    xw = _overlapping_windows(jnp.pad(x, pad_cfg), halo, chunk, n_chunks)
    cw = _overlapping_windows(
        jnp.pad(c, pad_cfg[:2] + ((0, 0),)), halo, chunk, n_chunks
    )
    gate_scale = jnp.concatenate(
        [jnp.ones((R,), jnp.float32), jnp.full((G - R,), 0.5, jnp.float32)]
    )
    if int8_taps:
        w_tap = w["w_tap_q"].reshape(L, 3 * R, G)  # int8; gate fold is in
        # s_tap's per-half scale... taps quantized per layer, gate halves
        # folded into the rescale would need per-column scales; for the
        # timing experiment fold 0.5 into w before quantization instead
    else:
        w_tap = (w["w_tap"] * gate_scale).reshape(L, 3 * R, G).astype(
            jnp.bfloat16
        )
    w_aux = (w["w_aux"] * gate_scale).astype(jnp.bfloat16)
    b_tap = (w["b_tap"] * gate_scale).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * n_chunks, L),
        in_specs=[
            pl.BlockSpec((1, tb, R), lambda i, l, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, A), lambda i, l, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * R, G), lambda i, l, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda i, l, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, G), lambda i, l, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, SR), lambda i, l, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SR), lambda i, l, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # s_tap (L, 2) scales
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, R), lambda i, l, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, S), lambda i, l, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((pad + tb + pad, R), jnp.float32)],
    )
    out = pl.pallas_call(
        partial(
            _variant_kernel, halo=halo, chunk=chunk, pad=pad,
            n_chunks=n_chunks, n_layers=L, t_len=T, gate=gate,
            int8_taps=int8_taps,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * n_chunks, chunk, R), x.dtype),
            jax.ShapeDtypeStruct((B * n_chunks, chunk, S), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=bool(os.environ.get("EXP_INTERPRET")),
    )(
        jnp.asarray(dilations, jnp.int32),
        xw, cw, w_tap, b_tap[:, None], w_aux,
        w["w_so"].astype(jnp.bfloat16), w["b_so"][:, None].astype(jnp.float32),
        s_tap,
    )
    x_out = out[0].reshape(B, t_pad, R)[:, :T]
    skip = out[1].reshape(B, t_pad, S)[:, :T]
    return x_out, skip


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/parallelwavegan_tpu/xla"),
    )
    rng = np.random.default_rng(0)
    L, R, G, A, S = 10, 64, 128, 80, 64
    dilations = tuple(2**i for i in range(L))
    B = int(os.environ.get("BENCH_BATCH", 32))
    T = int(os.environ.get("BENCH_FRAMES", 512)) * 256
    dt = jnp.bfloat16

    w = {
        "w_tap": jnp.asarray(rng.standard_normal((L, 3, R, G)) * 0.08,
                             jnp.float32).reshape(L, 3 * R, G),
        "b_tap": jnp.asarray(rng.standard_normal((L, G)) * 0.01, jnp.float32),
        "w_aux": jnp.asarray(rng.standard_normal((L, A, G)) * 0.08,
                             jnp.float32),
        "w_so": jnp.asarray(rng.standard_normal((L, R, S + R)) * 0.08,
                            jnp.float32),
        "b_so": jnp.asarray(rng.standard_normal((L, S + R)) * 0.01,
                            jnp.float32),
    }
    # product-kernel weight layout for the baseline call
    w_prod = dict(w)
    w_prod["w_tap"] = w["w_tap"].reshape(L, 3, R, G)
    x = jnp.asarray(rng.standard_normal((B, T, R)) * 0.3, dt)
    c = jnp.asarray(rng.standard_normal((B, T, A)) * 0.5, dt)

    # f32 XLA reference for accuracy accounting
    ref_x, ref_skip = wavenet_stack_reference(
        x.astype(jnp.float32), c.astype(jnp.float32),
        {k: v if k != "w_tap" else v.reshape(L, 3, R, G)[:, :, :, :]
         for k, v in w.items()},
        dilations,
    )
    ref_skip = np.asarray(ref_skip)

    def timeit(f, *args):
        out = f(*args)
        jax.block_until_ready(out)
        n = 10
        tic = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        float(jnp.sum(out[1][:, :8, :8].astype(jnp.float32)))
        return (time.perf_counter() - tic) / n, out

    def emit(name, ms, snr=None):
        print(json.dumps({
            "metric": name, "value": round(ms * 1e3, 3), "unit": "ms",
            "vs_baseline": None if snr is None else round(snr, 1),
        }))

    def snr_db(skip):
        err = np.asarray(skip, np.float32) - ref_skip
        return 10 * np.log10(
            float((ref_skip**2).mean()) / max(float((err**2).mean()), 1e-30)
        )

    # 1. baseline: the product kernel
    interp = bool(os.environ.get("EXP_INTERPRET"))
    base = jax.jit(
        lambda x, c: wavenet_stack(
            x, c,
            {k: (v.reshape(L, 3, R, G) if k == "w_tap" else v).astype(dt)
             if k.startswith("w") else v for k, v in w.items()},
            dilations, interpret=interp,
        )
    )
    t_base, out = timeit(base, x, c)
    emit("wavenet_bf16_baseline_ms", t_base, snr_db(out[1]))

    s_dummy = jnp.ones((L, 2), jnp.float32)

    # 2. gate=mul timing bound (wrong math on purpose; no SNR)
    gate_mul = jax.jit(
        lambda x, c: variant_stack(x, c, w, s_dummy, dilations, gate="mul")
    )
    t_mul, _ = timeit(gate_mul, x, c)
    emit("wavenet_no_transcendental_bound_ms", t_mul)

    # sanity: the bf16 variant path reproduces the baseline's math
    var_bf16 = jax.jit(
        lambda x, c: variant_stack(x, c, w, s_dummy, dilations, gate="tanh")
    )
    t_var, out = timeit(var_bf16, x, c)
    emit("wavenet_variant_bf16_ms", t_var, snr_db(out[1]))

    # 3. int8 taps: fold the gate 0.5 into the weights BEFORE quantization,
    # per-layer symmetric weight scale, static activation scale from the
    # observed residual range (serving would calibrate this the int8-MRF
    # way)
    gate_scale = np.concatenate([np.ones(R), np.full(G - R, 0.5)])
    w_tap_f = np.asarray(w["w_tap"]) * gate_scale  # (L, 3R, G)
    w_scale = np.abs(w_tap_f).max(axis=(1, 2)) / 127.0  # (L,)
    w_tap_q = np.clip(
        np.round(w_tap_f / w_scale[:, None, None]), -127, 127
    ).astype(np.int8)
    # activation scale: run the bf16 baseline and take the max |xcat| proxy
    # = max |residual state| (the packed window is slices of it)
    act_max = float(jnp.max(jnp.abs(out[0].astype(jnp.float32)))) * 1.05
    act_scale = act_max / 127.0
    s_tap = jnp.asarray(
        np.stack([np.full(L, 1.0 / act_scale),
                  w_scale * act_scale], axis=1),
        jnp.float32,
    )
    w_i8 = dict(w)
    w_i8["w_tap_q"] = jnp.asarray(w_tap_q)
    var_i8 = jax.jit(
        lambda x, c: variant_stack(
            x, c, w_i8, s_tap, dilations, gate="tanh", int8_taps=True
        )
    )
    try:
        t_i8, out8 = timeit(var_i8, x, c)
        emit("wavenet_int8_taps_ms", t_i8, snr_db(out8[1]))
    except Exception as e:
        print(json.dumps({
            "metric": "wavenet_int8_taps_ms", "value": -1.0,
            "unit": f"FAILED: {type(e).__name__}: {str(e)[:200]}",
            "vs_baseline": None,
        }))


if __name__ == "__main__":
    main()
