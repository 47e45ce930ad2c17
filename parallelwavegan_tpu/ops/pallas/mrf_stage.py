"""Fused HiFiGAN MRF stage as a Pallas TPU kernel (int8-native schedule).

Why this kernel exists (the measured story, docs/BENCHMARKS.md):
the V1 generator's late stages (C=64 @ T=65k, C=32 @ T=131k per utterance)
are the serving bottleneck. In bf16 they are HBM-streaming-bound (580-620
GB/s, 2 passes per conv — XLA's floor for unfused convs); int8 halves the
byte stream but leaves 36 conv-boundary HBM passes per stage and XLA's
small-C conv shapes at 19-57% MXU utilization, which is why `decode
--int8` measured +25% rather than the byte-stream ~2x.

This kernel runs ONE ENTIRE MRF stage — 3 residual branches x 3 layers x
(dilated conv + 1-dilation conv), LeakyReLU epilogues, residual adds, and
the branch mean — per time chunk with all activations resident in VMEM:

  HBM traffic/stage: 36 activation passes -> 2 (read x, write mean).
  MXU schedule: the k conv taps are packed into one K = k*C contraction
  (k=11, C=32 -> K=352) instead of XLA's per-tap/im2col splits; matmuls
  run int8 x int8 -> int32 (quant=True; the MXU's double int8 rate) with
  the SAME folded per-input-channel activation scales as the XLA serving
  path (ops/hifigan_infer.py), or bf16 (quant=False) for A/B.

Structure follows ops/pallas/wavenet_stack.py (the proven PWG kernel):
grid = (batch*time_chunks, 9 branch-layer steps); the branch residual
state lives in an f32 VMEM scratch that persists across the 9 sequential
grid steps (f32 because Mosaic supports unaligned dynamic sublane slices
— the tap reads at pad±d — only for 32-bit data); halo'd overlapping
windows reproduce chunk-interior context, zeroed pad margins reproduce
conv zero padding at sequence borders, and out-of-sequence rows are
re-zeroed after every conv so halo garbage cannot accumulate.

Math per branch-layer step (identical to models/hifigan.py MRF):
    xt = conv_{k,d}(leaky(xb));  xt = conv_{k,1}(leaky(xt));  xb += xt
with per-conv int8 quantization exactly as the XLA int8 path: input
x/sx per channel, weight pre-folded w*sx then per-out-channel quantized,
int32 accumulation, f32 rescale + bias.

Behavioral source: /root/reference/parallel_wavegan/models/hifigan.py
residual blocks (HiFiGANResidualBlock, k in {3,7,11}, dils (1,3,5));
quantization scheme: ops/hifigan_infer.py qconv.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _overlapping_windows(x: jnp.ndarray, halo: int, chunk: int, n_chunks: int):
    """(B, Tpad, C) -> (B*n, chunk+2*halo, C) halo'd windows."""
    tb = chunk + 2 * halo
    idx = np.arange(n_chunks)[:, None] * chunk + np.arange(tb)[None, :]
    w = x[:, idx]
    return w.reshape((-1, tb, x.shape[-1]))


def _leaky(x, slope):
    return jnp.where(x >= 0, x, x * slope)


def _quant_to_i8(x, inv_s):
    """round-to-nearest int8 with saturation (matches jnp.clip(round))."""
    return jnp.clip(jnp.round(x * inv_s), -127.0, 127.0).astype(jnp.int8)


def _mrf_kernel(
    dil_ref,        # scalar-prefetch (n_steps,) int32 per-step dilations
    x_ref,          # (1, tb, C) stage input window (bf16/f32)
    w0_ref, w1_ref, w2_ref,   # (1, 2, K_b, C) per-branch conv weights
    s0_ref, s1_ref, s2_ref,   # (1, 2, 4, C) f32 [inv_sx, sw, bias, spare]
    out_ref,        # (1, chunk, C) stage output (mean over branches)
    xin, xpad, ypad, lpad,    # scratch (see pallas_call)
    *,
    kernels: Tuple[int, ...],
    dils: Tuple[int, ...],
    halo: int, chunk: int, pad: int, n_chunks: int, t_len: int,
    slope: float, quant: bool, n_branches: int,
):
    C = x_ref.shape[-1]
    tb = x_ref.shape[1]
    f32 = jnp.float32
    s = pl.program_id(1)
    k_chunk = pl.program_id(0) % n_chunks
    li = s % len(dils)
    branch = s // len(dils)
    d = dil_ref[s]

    # global sequence positions of the window rows (for out-of-sequence
    # masking: every conv zero-pads at the SEQUENCE boundary only)
    pos = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0) + \
        k_chunk * chunk - halo
    in_seq = jnp.logical_and(pos >= 0, pos < t_len)

    @pl.when(s == 0)
    def _():
        xin[...] = jnp.where(in_seq, x_ref[0].astype(f32), 0.0)
        xpad[pl.ds(0, pad)] = jnp.zeros((pad, C), f32)
        xpad[pl.ds(pad + tb, pad)] = jnp.zeros((pad, C), f32)
        ypad[pl.ds(0, pad)] = jnp.zeros((pad, C), f32)
        ypad[pl.ds(pad + tb, pad)] = jnp.zeros((pad, C), f32)

    @pl.when(li == 0)
    def _():  # new branch: residual state <- stage input
        xpad[pl.ds(pad, tb)] = xin[...]

    def conv_pair(w_ref, s_ref, k: int):
        half = (k - 1) // 2

        def one_conv(src_pad, ci: int, dil):
            """conv over the padded f32 buffer; returns (tb, C) f32."""
            # leaky into a scratch ref, then build the K=k*C tap window
            # from dynamic (possibly sublane-unaligned) slices of it —
            # Mosaic supports unaligned dynamic sublane slices for 32-bit
            # data (see wavenet_stack.py); margins are zero so leaky(0)=0
            # keeps the zero-pad semantics
            lpad[...] = _leaky(src_pad[...], slope)
            win = jnp.concatenate(
                [
                    lpad[pl.ds(pad + (t - half) * dil, tb)]
                    for t in range(k)
                ],
                axis=-1,
            )  # (tb, k*C)
            w = w_ref[0, ci]  # (k*C, C) int8 or bf16
            if quant:
                inv_sx = s_ref[0, ci, 0]       # (C,) f32, 1/sx
                sw = s_ref[0, ci, 1]
                b = s_ref[0, ci, 2]
                win_q = _quant_to_i8(win, jnp.tile(inv_sx, k))
                y = jax.lax.dot_general(
                    win_q, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = y.astype(f32) * sw + b
            else:
                b = s_ref[0, ci, 2]
                y = jax.lax.dot_general(
                    win.astype(w.dtype), w, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                y = y + b
            return jnp.where(in_seq, y, 0.0)

        y1 = one_conv(xpad, 0, d)
        ypad[pl.ds(pad, tb)] = y1
        y2 = one_conv(ypad, 1, jnp.int32(1))
        xb = xpad[pl.ds(pad, tb)] + y2
        xpad[pl.ds(pad, tb)] = jnp.where(in_seq, xb, 0.0)

    # one static arm per branch (kernel sizes differ -> static shapes)
    for b, (k, w_ref, s_ref) in enumerate(
        zip(kernels, (w0_ref, w1_ref, w2_ref), (s0_ref, s1_ref, s2_ref))
    ):
        @pl.when(branch == b)
        def _(k=k, w_ref=w_ref, s_ref=s_ref):
            conv_pair(w_ref, s_ref, k)

    @pl.when(li == len(dils) - 1)
    def _():  # branch finished: accumulate the mean into the output
        contrib = xpad[pl.ds(pad + halo, chunk)] * (1.0 / n_branches)

        @pl.when(branch == 0)
        def _():
            out_ref[0] = contrib.astype(out_ref.dtype)

        @pl.when(branch > 0)
        def _():
            out_ref[0] = (out_ref[0].astype(f32) + contrib).astype(
                out_ref.dtype
            )


@partial(
    jax.jit,
    static_argnames=("kernels", "dils", "chunk", "quant", "slope",
                     "interpret"),
)
def mrf_stage(
    x: jnp.ndarray,
    pack: Dict[str, jnp.ndarray],
    *,
    kernels: Tuple[int, ...] = (3, 7, 11),
    dils: Tuple[int, ...] = (1, 3, 5),
    chunk: int = 4096,
    quant: bool = True,
    slope: float = 0.1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run one fused MRF stage over x (B, T, C) -> (B, T, C).

    pack: per-branch arrays from build_stage_pack():
      w{b}: (n_layers, 2, k_b*C, C) int8 (quant) or model-dtype (bf16 A/B)
      s{b}: (n_layers, 2, 4, C) f32 rows [1/sx, sw, bias, 0]
    """
    B, T, C = x.shape
    n_layers = len(dils)
    n_branches = len(kernels)
    max_reach = max(
        (k - 1) // 2 * (d + 1) for k in kernels for d in dils
    )
    reach = sum(
        max((k - 1) // 2 * d + (k - 1) // 2 for k in kernels)
        for d in dils
    )  # full stage reach of the deepest branch
    halo = _round_up(reach, 8)
    pad = _round_up(max(
        (k - 1) // 2 * max(dils) for k in kernels
    ), 8)
    del max_reach
    tb = chunk + 2 * halo
    n_chunks = -(-T // chunk)
    t_pad = n_chunks * chunk

    xw = _overlapping_windows(
        jnp.pad(x, ((0, 0), (halo, halo + t_pad - T), (0, 0))),
        halo, chunk, n_chunks,
    )

    total_k = sum(kernels)
    flops = 2 * B * t_pad * 2 * n_layers * total_k * C * C
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * n_chunks, n_branches * n_layers),
        in_specs=[
            pl.BlockSpec((1, tb, C), lambda i, s, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(
                (1, 2, kernels[b] * C, C),
                lambda i, s, *_: (s % n_layers, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for b in range(n_branches)
        ] + [
            pl.BlockSpec(
                (1, 2, 4, C), lambda i, s, *_: (s % n_layers, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(n_branches)
        ],
        out_specs=pl.BlockSpec((1, chunk, C), lambda i, s, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tb, C), jnp.float32),                 # xin
            pltpu.VMEM((pad + tb + pad, C), jnp.float32),     # xpad
            pltpu.VMEM((pad + tb + pad, C), jnp.float32),     # ypad
            pltpu.VMEM((pad + tb + pad, C), jnp.float32),     # lpad
        ],
    )
    out = pl.pallas_call(
        partial(
            _mrf_kernel,
            kernels=kernels, dils=dils,
            halo=halo, chunk=chunk, pad=pad, n_chunks=n_chunks,
            t_len=T, slope=slope, quant=quant, n_branches=n_branches,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * n_chunks, chunk, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * n_chunks * tb * C * 2 * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(list(dils) * n_branches, jnp.int32),
        xw,
        pack["w0"], pack["w1"], pack["w2"],
        pack["s0"], pack["s1"], pack["s2"],
    )
    return out.reshape(B, t_pad, C)[:, :T]


def build_stage_pack(
    weights: Sequence[Sequence[Tuple[jnp.ndarray, jnp.ndarray]]],
    scales: Sequence[Sequence[np.ndarray]],
    *,
    quant: bool = True,
    dtype=jnp.bfloat16,
) -> Dict[str, jnp.ndarray]:
    """Pack one stage's MRF weights for the kernel.

    weights[b][li*2+ci] = (w (k, Cin, Cout), bias (Cout,)) in model layout;
    scales[b][li*2+ci]  = per-input-channel activation scale sx (Cin,)
                          (ignored when quant=False).

    Returns {w0,w1,w2,s0,s1,s2} as described in mrf_stage(). Weight fold:
    w'[k,ci,co] = w[k,ci,co] * sx[ci], then per-out-channel int8 quant —
    identical to ops/hifigan_infer.py qconv, so conv(x_q, w_q)*sw == conv.
    """
    pack: Dict[str, jnp.ndarray] = {}
    for b, branch in enumerate(weights):
        w_rows, s_rows = [], []
        for li in range(len(branch) // 2):
            w_ci, s_ci = [], []
            for ci in range(2):
                w, bias = branch[li * 2 + ci]
                k, Cin, Cout = w.shape
                if quant:
                    sx = np.asarray(scales[b][li * 2 + ci], np.float32)
                    sx = np.broadcast_to(sx, (Cin,)).astype(np.float32)
                    wf = np.asarray(w, np.float32) * sx[None, :, None]
                    sw = np.maximum(
                        np.abs(wf).max(axis=(0, 1)) / 127.0, 1e-12
                    )
                    wq = np.clip(np.round(wf / sw), -127, 127).astype(
                        np.int8
                    )
                    w_ci.append(wq.reshape(k * Cin, Cout))
                    s_ci.append(np.stack([
                        1.0 / sx,
                        sw.astype(np.float32),
                        np.asarray(bias, np.float32),
                        np.zeros((Cout,), np.float32),
                    ]))
                else:
                    w_ci.append(
                        np.asarray(w, np.float32).reshape(k * Cin, Cout)
                    )
                    s_ci.append(np.stack([
                        np.ones((Cin,), np.float32),
                        np.ones((Cout,), np.float32),
                        np.asarray(bias, np.float32),
                        np.zeros((Cout,), np.float32),
                    ]))
            w_rows.append(np.stack(w_ci))
            s_rows.append(np.stack(s_ci))
        pack[f"w{b}"] = jnp.asarray(
            np.stack(w_rows),
            jnp.int8 if quant else dtype,
        )
        pack[f"s{b}"] = jnp.asarray(np.stack(s_rows), jnp.float32)
    return pack


def mrf_stage_reference(x, pack, *, kernels=(3, 7, 11), dils=(1, 3, 5),
                        quant=True, slope=0.1):
    """XLA reference with identical math (f32 residual stream) for parity
    tests of the kernel."""
    f32 = jnp.float32
    B, T, C = x.shape
    acc = 0.0
    for b, k in enumerate(kernels):
        xb = x.astype(f32)
        for li, d in enumerate(dils):
            xt = xb
            for ci, dd in enumerate((d, 1)):
                xt = _leaky(xt, slope)
                w = pack[f"w{b}"][li, ci]          # (k*C, C)
                sc = pack[f"s{b}"][li, ci]
                wk = w.reshape(k, C, C)
                pad_t = (k - 1) // 2 * dd
                xp = jnp.pad(xt, ((0, 0), (pad_t, pad_t), (0, 0)))
                win = jnp.concatenate(
                    [xp[:, t * dd: t * dd + T] for t in range(k)], axis=-1
                )
                if quant:
                    inv_sx = sc[0]
                    win_q = _quant_to_i8(win, jnp.tile(inv_sx, k))
                    y = jax.lax.dot_general(
                        win_q, wk.reshape(k * C, C),
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    xt = y.astype(f32) * sc[1] + sc[2]
                else:
                    y = jax.lax.dot_general(
                        win.astype(w.dtype), wk.reshape(k * C, C),
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )
                    xt = y + sc[2]
            xb = xb + xt
        acc = acc + xb
    return (acc / len(kernels)).astype(x.dtype)
