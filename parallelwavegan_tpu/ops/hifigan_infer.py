"""HiFi-GAN serving path: functional forward + int8 activation quantization.

Behavioral source: the flax ``HiFiGANGenerator``
(models/hifigan.py, itself matching /root/reference/parallel_wavegan/models/
hifigan.py:23-267). This module re-expresses the generator forward as a
functional program over pre-folded weights so serving can

  1. fold weight norm once instead of per call,
  2. optionally run the MRF conv chain — 97% of the FLOPs and bytes — with
     int8 activations and weights.

Why int8: the V1 generator at serving batch sizes is HBM-bandwidth-bound on
TPU (measured 461-622 GB/s sustained, 2 HBM passes per conv — see
docs/BENCHMARKS.md "HiFiGAN serving roofline"). bf16 XLA already sits at
~82% of the practical matmul peak, and Pallas fusion loses the saved bytes
to window-relayout VPU traffic. Halving the activation byte stream is the
one remaining lever; int8 weights ride along (weight bytes are negligible,
but the int8×int8 MXU path is also ~25% faster where compute-bound).

Scheme: static per-INPUT-CHANNEL activation scales, folded exactly into
the weights. One calibration pass records per-channel max|x| of every
quantized conv input; at quantization time x is scaled per channel
(x_q[c] = x[c]/sx[c]) and the weight absorbs sx BEFORE its own
per-output-channel quantization (w'[k,c,o] = w[k,c,o]*sx[c]), so
conv(x_q, w'_q)*sw_o is algebraically the original conv — per-channel
scales cost nothing extra at runtime. Per-channel matters: per-TENSOR
activation scales are catastrophically lossy on TRAINED HiFiGAN weights
(measured copy-synthesis MCD 36 dB vs 6.1 full-precision on the rich_v1
checkpoint — trained MRF channels span orders of magnitude; random-init
tests never caught it). Conv epilogues (rescale, bias, leaky, residual
add) stay in f32/bf16 and the requantize folds into the producing op, so
every MRF activation crosses HBM exactly once as int8. Deconvs, the
input/output convs, and tanh stay bf16 (cheap, and the output conv's
dynamic range matters for the waveform).

Exactness: with quant=None this forward is bit-identical (up to dtype) to
``HiFiGANGenerator.__call__`` — asserted in tests/test_pallas_kernels.py.
The int8 path's copy-synthesis quality delta is measured in
docs/VALIDATION.md ("int8 serving mode").
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.ops.conv import conv1d, conv_transpose1d


def supports_fast_inference(gen) -> bool:
    """Covers the reference HiFiGAN config space used for mel→wav serving:
    non-causal, same #branches as resblock kernels."""
    return (
        not gen.use_causal_conv
        and len(gen.resblock_kernel_sizes) == len(gen.resblock_dilations)
    )


def _fold(p: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fold (kernel_v, kernel_g) -> kernel; axes inferred from g's shape."""
    if "kernel" in p:
        k = p["kernel"]
    else:
        v, g = p["kernel_v"], p["kernel_g"]
        axes = tuple(i for i, s in enumerate(g.shape) if s == 1)
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
        k = v * (g / jnp.maximum(norm, 1e-12))
    return k, p.get("bias")


def _leaky(x, slope):
    return jax.nn.leaky_relu(x, slope)


def _quant_w(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel int8 weight quantization; w (K, Cin, Cout)."""
    s = jnp.max(jnp.abs(w), axis=(0, 1)) / 127.0
    s = jnp.maximum(s, 1e-12)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s.astype(jnp.float32)


def _quant_x(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def hifigan_fast_forward(
    gen,
    variables: Dict[str, Any],
    c: jnp.ndarray,
    *,
    scales: Optional[Dict[str, float]] = None,
    collect_stats: bool = False,
    mrf_packs: Optional[Dict[int, Dict[str, jnp.ndarray]]] = None,
    mrf_interpret: bool = False,
):
    """Forward c (B, T', in_ch) -> (B, T'*upsample_factor, out_ch).

    scales=None, collect_stats=False: exact bf16/f32 forward (math of
      HiFiGANGenerator.__call__, weight norm folded once).
    collect_stats=True: returns (y, stats) where stats maps tensor ids to
      max|x| of every would-be-quantized conv input (jit-friendly; feed
      through `make_scales`).
    scales=dict: int8 MRF path using those static per-tensor scales.
    mrf_packs: per-stage packs from build_mrf_packs() — those stages run
      the fused Pallas MRF kernel (ops/pallas/mrf_stage.py: whole stage
      VMEM-resident, K=k*C tap-packed int8 matmuls) instead of the XLA
      conv chain. Orthogonal to `scales` (a pack carries its own
      quantization); stages not in the dict keep the XLA path.
    """
    assert supports_fast_inference(gen)
    p = variables["params"]
    slope = (gen.nonlinear_activation_params or {}).get(
        "negative_slope", 0.1
    )
    dtype = c.dtype
    stats: Dict[str, jnp.ndarray] = {}

    def qconv(x, key, w, b, k, d):
        """MRF conv: int8 when scales are given, else plain; x is the
        pre-activation input in compute dtype."""
        if collect_stats:
            # per-input-channel max|x| (see module docstring: per-tensor
            # scales are lossy on trained weights)
            stats[key] = jnp.max(jnp.abs(x), axis=(0, 1)).astype(jnp.float32)
        if scales is None or key not in scales:
            # per-key fallback makes quantization stage-selective: drop a
            # stage's keys from the dict and its convs stay bf16 (used by
            # the mixed-precision serving schedule, docs/BENCHMARKS.md)
            return conv1d(x, w.astype(x.dtype), b, padding=(k - 1) // 2 * d,
                          dilation=d)
        # sx: (Cin,) per-channel (scalar also broadcasts for back-compat)
        sx = jnp.asarray(scales[key], jnp.float32)
        # fold the activation scale into the weight, then quantize the
        # folded weight per output channel: conv(x/sx, w*sx) == conv(x, w)
        w_folded = w.astype(jnp.float32) * sx.reshape(1, -1, 1)
        wq, sw = _quant_w(w_folded)
        xq = _quant_x(x, sx.astype(x.dtype))
        # int32 accumulation is NOT optional: int8-in/int8-out conv wraps
        # mod 256 (caught on trained weights; ops/conv.py docstring)
        y = conv1d(xq, wq, None, padding=(k - 1) // 2 * d, dilation=d,
                   precision=None, preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * sw
        if b is not None:
            y = y + b
        return y.astype(x.dtype)

    def qdeconv(x, key, w, b, s_up):
        """Upsample deconv: int8 (same per-channel weight fold as qconv —
        the transposed conv also contracts over Cin) when scales carry the
        key; bf16 otherwise. ~3-4%% of the byte stream per stage."""
        if collect_stats:
            stats[key] = jnp.max(jnp.abs(x), axis=(0, 1)).astype(jnp.float32)
        kw = dict(stride=s_up, padding=s_up // 2 + s_up % 2,
                  output_padding=s_up % 2)
        if scales is None or key not in scales:
            return conv_transpose1d(x, w.astype(x.dtype), b, **kw)
        sx = jnp.asarray(scales[key], jnp.float32)
        wq, sw = _quant_w(w.astype(jnp.float32) * sx.reshape(1, -1, 1))
        xq = _quant_x(x, sx.astype(x.dtype))
        y = conv_transpose1d(xq, wq, None, precision=None,
                             preferred_element_type=jnp.int32, **kw)
        y = y.astype(jnp.float32) * sw
        if b is not None:
            y = y + b
        return y.astype(x.dtype)

    # input conv (bf16; mel-rate bytes are negligible)
    w, b = _fold(p["input_conv"])
    x = conv1d(c, w.astype(dtype), b, padding=(gen.kernel_size - 1) // 2)

    num_blocks = len(gen.resblock_kernel_sizes)
    for i, (s_up, k_up) in enumerate(
        zip(gen.upsample_scales, gen.upsample_kernel_sizes)
    ):
        x = _leaky(x, slope)
        w, b = _fold(p[f"upsamples_{i}"])
        x = qdeconv(x, f"s{i}_up", w, b, s_up)
        if mrf_packs is not None and i in mrf_packs:
            from parallelwavegan_tpu.ops.pallas.mrf_stage import mrf_stage

            pack = mrf_packs[i]
            x = mrf_stage(
                x, {k: v for k, v in pack.items()
                    if k not in ("chunk", "quant")},
                kernels=tuple(gen.resblock_kernel_sizes),
                dils=tuple(gen.resblock_dilations[0]),
                chunk=pack["chunk"], quant=pack["quant"], slope=slope,
                interpret=mrf_interpret,
            )
            continue
        acc = 0.0
        for j, (k_res, dils) in enumerate(
            zip(gen.resblock_kernel_sizes, gen.resblock_dilations)
        ):
            bp = p[f"blocks_{i * num_blocks + j}"]
            xb = x
            for li, d in enumerate(dils):
                w1, b1 = _fold(bp[f"convs1_{li}"])
                xt = _leaky(xb, slope)
                xt = qconv(xt, f"s{i}_b{j}_l{li}_c1", w1, b1, k_res, d)
                if gen.use_additional_convs:
                    w2, b2 = _fold(bp[f"convs2_{li}"])
                    xt = _leaky(xt, slope)
                    xt = qconv(xt, f"s{i}_b{j}_l{li}_c2", w2, b2, k_res, 1)
                xb = xt + xb
            acc = acc + xb
        x = acc / num_blocks
    # official impl uses the default slope here (models/hifigan.py:129)
    x = _leaky(x, 0.01)
    w, b = _fold(p["output_conv"])
    x = conv1d(x, w.astype(dtype), b, padding=(gen.kernel_size - 1) // 2)
    y = jnp.tanh(x)
    if collect_stats:
        return y, stats
    return y


def make_scales(stats: Dict[str, jnp.ndarray], margin: float = 1.05
                ) -> Dict[str, np.ndarray]:
    """Calibration stats (per-channel max|x|) -> static scale vectors."""
    return {
        k: (np.maximum(np.asarray(v, np.float32) * margin, 1e-8) / 127.0)
        for k, v in stats.items()
    }


def calibrate(gen, variables, c) -> Dict[str, float]:
    """One bf16 pass over representative mels -> int8 activation scales."""
    fwd = jax.jit(
        lambda v, c: hifigan_fast_forward(gen, v, c, collect_stats=True)[1]
    )
    return make_scales(jax.device_get(fwd(variables, c)))


def filter_scales_schedule(
    scales: Dict[str, np.ndarray], gen, schedule: str = "auto"
) -> Dict[str, np.ndarray]:
    """Apply a quantization schedule by filtering calibration scales.

    'all': every calibrated conv runs int8 (the round-3 behavior).
    'auto' (product default): int8 on the C>=128 MRF stages and every
      upsample deconv; the C<=64 MRF stages stay bf16. Measured basis
      (docs/BENCHMARKS.md, "mixed-precision int8 schedule"): the small-C
      stages are HBM-streaming-bound in bf16 and XLA's small-C int8
      convs are no faster in-graph (slower in isolation), so quantizing
      them buys nothing — the mixed schedule measures faster than
      all-int8 AND quantizes fewer convs (strictly less quantization
      noise).
    """
    if schedule == "all":
        return scales
    assert schedule == "auto", schedule
    keep = {}
    for key, v in scales.items():
        if key.endswith("_up"):
            keep[key] = v
            continue
        stage = int(key[1:key.index("_")])
        if gen.channels // (2 ** (stage + 1)) >= 128:
            keep[key] = v
    return keep


def supports_mrf_kernel(gen) -> bool:
    """The fused Pallas MRF stage covers the V1-shaped geometry: 3
    branches with a SHARED per-layer dilation schedule and additional
    (dilation-1) convs — i.e. every official HiFiGAN V1/V2 config."""
    dils = [tuple(d) for d in gen.resblock_dilations]
    return (
        supports_fast_inference(gen)
        and gen.use_additional_convs
        and len(gen.resblock_kernel_sizes) == 3
        and len(set(dils)) == 1
    )


def build_mrf_packs(
    gen,
    variables: Dict[str, Any],
    scales: Optional[Dict[str, np.ndarray]] = None,
    *,
    stages: Optional[Sequence[int]] = None,
    quant: bool = True,
    dtype=jnp.bfloat16,
) -> Dict[int, Dict[str, Any]]:
    """Per-stage packs for the fused Pallas MRF kernel.

    stages: which upsample stages run the kernel (default: all).
    quant=True folds the calibration `scales` (from calibrate()) into
    int8 weights exactly like qconv; quant=False packs bf16 weights (the
    pure byte-elimination A/B). Chunk sizes shrink with channel width so
    each stage's window scratch stays comfortably inside VMEM.
    """
    assert supports_mrf_kernel(gen)
    if quant:
        assert scales is not None, "quant packs need calibration scales"
    p = variables["params"]
    num_blocks = len(gen.resblock_kernel_sizes)
    n_layers = len(gen.resblock_dilations[0])
    packs: Dict[int, Dict[str, Any]] = {}
    ch = gen.channels
    from parallelwavegan_tpu.ops.pallas.mrf_stage import build_stage_pack

    for i in range(len(gen.upsample_scales)):
        if stages is not None and i not in stages:
            continue
        c_stage = ch // (2 ** (i + 1))
        weights, sxs = [], []
        for j in range(num_blocks):
            bp = p[f"blocks_{i * num_blocks + j}"]
            w_list, s_list = [], []
            for li in range(n_layers):
                for ci in (1, 2):
                    w, b = _fold(bp[f"convs{ci}_{li}"])
                    w_list.append((np.asarray(w, np.float32),
                                   np.asarray(b, np.float32)))
                    s_list.append(
                        np.asarray(scales[f"s{i}_b{j}_l{li}_c{ci}"],
                                   np.float32)
                        if quant else np.ones((c_stage,), np.float32)
                    )
            weights.append(w_list)
            sxs.append(s_list)
        pack = build_stage_pack(weights, sxs, quant=quant, dtype=dtype)
        # VMEM budget: the biggest per-arm temporary is the k=11 window
        # (tb, 11*C) f32; shrink the chunk as C grows
        pack["chunk"] = {32: 4096, 64: 4096, 128: 2048}.get(c_stage, 1024)
        pack["quant"] = quant
        packs[i] = pack
    return packs
