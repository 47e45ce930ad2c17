#!/usr/bin/env python3
"""Per-stage int8 vs bf16 roofline for the HiFiGAN V1 serving path.

The bf16 roofline in docs/BENCHMARKS.md measured the MRF towers stage by
stage (C=256/128/64/32 at their true sequence lengths) and located the
serving bottleneck. This tool repeats that isolation for the int8 path so
the int8-native Pallas schedule (ops/pallas/mrf_stage.py) is built against
measured stage times, not guesses. It also microbenchmarks raw Pallas
int8 matmuls at the kernel's exact contraction shapes to establish what
the MXU actually delivers for K=k*C, N=C tiles on this chip.

Usage (on the TPU):  python tools/int8_stage_roofline.py [--stages 2,3]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _steady(run_once, n_warm=20, n=20):
    acc = None
    for i in range(n_warm):
        s = run_once(i)
        acc = s if acc is None else acc + s
    float(acc)
    tic = time.perf_counter()
    acc = None
    for i in range(n):
        s = run_once(i)
        acc = s if acc is None else acc + s
    float(acc)
    return (time.perf_counter() - tic) / n


# HiFiGAN V1 stages at serving batch 128 x 512 frames
STAGES = {
    # stage -> (C, T_per_utt)
    0: (256, 4096),
    1: (128, 32768),
    2: (64, 65536),
    3: (32, 131072),
}
KERNELS = (3, 7, 11)
DILS = (1, 3, 5)


def tower_forward(x, weights, slope=0.1, quant=False):
    """One full MRF stage: 3 branches x 3 layers x (dilated + d=1 conv),
    residual adds, branch-sum/3 — the math of models/hifigan.py MRF."""
    import jax
    import jax.numpy as jnp

    from parallelwavegan_tpu.ops.conv import conv1d

    def q_conv(xin, w, k, d):
        if not quant:
            return conv1d(xin, w.astype(xin.dtype), None,
                          padding=(k - 1) // 2 * d, dilation=d)
        # per-input-channel scales folded into the weight (the product
        # int8 scheme of ops/hifigan_infer.py, with calibration replaced
        # by the true per-channel max of this random input)
        sx = jnp.max(jnp.abs(xin), axis=(0, 1)) / 127.0 + 1e-8
        wf = w.astype(jnp.float32) * sx.reshape(1, -1, 1)
        sw = jnp.max(jnp.abs(wf), axis=(0, 1)) / 127.0 + 1e-12
        wq = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
        xq = jnp.clip(jnp.round(xin / sx), -127, 127).astype(jnp.int8)
        y = conv1d(xq, wq, None, padding=(k - 1) // 2 * d, dilation=d,
                   precision=None, preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * sw).astype(xin.dtype)

    acc = 0.0
    for bi, k in enumerate(KERNELS):
        xb = x
        for li, d in enumerate(DILS):
            xt = jax.nn.leaky_relu(xb, slope)
            xt = q_conv(xt, weights[(bi, li, 0)], k, d)
            xt = jax.nn.leaky_relu(xt, slope)
            xt = q_conv(xt, weights[(bi, li, 1)], k, 1)
            xb = xt + xb
        acc = acc + xb
    return acc / len(KERNELS)


def stage_bench(stage, batch, dtype_name):
    import jax
    import jax.numpy as jnp

    C, T = STAGES[stage]
    dtype = jnp.bfloat16
    rng = np.random.default_rng(stage)
    xs = [
        jnp.asarray(rng.standard_normal((batch, T, C)), dtype)
        for _ in range(3)
    ]
    weights = {
        (bi, li, j): jnp.asarray(
            rng.standard_normal((k, C, C)) * (0.3 / np.sqrt(k * C)), dtype
        )
        for bi, k in enumerate(KERNELS)
        for li in range(len(DILS))
        for j in range(2)
    }
    quant = dtype_name == "int8"
    f = jax.jit(
        lambda w, x: jnp.sum(
            tower_forward(x, w, quant=quant).astype(jnp.float32)
        )
    )
    float(f(weights, xs[0]))
    dt = _steady(lambda i: f(weights, xs[1 + i % 2]))
    total_k = sum(KERNELS)
    flops = 2 * batch * T * 2 * len(DILS) * total_k * C * C
    # bytes: every conv reads+writes T*C once in the stream dtype (weights
    # negligible); epilogues fuse
    n_convs = 2 * len(DILS) * len(KERNELS)
    elem = 1 if quant else 2
    gbytes = batch * T * C * n_convs * 2 * elem / 1e9
    print(json.dumps({
        "measure": f"stage{stage}_C{C}", "mode": dtype_name,
        "ms": round(dt * 1e3, 2),
        "tflops_per_s": round(flops / dt / 1e12, 1),
        "util_vs_peak": round(
            flops / dt / (394e12 if quant else 197e12), 3
        ),
        "gb_per_s_stream": round(gbytes / dt, 1),
    }))
    return dt


def pallas_matmul_bench(M, K, N, in_dtype_name):
    """Raw Pallas matmul throughput at the kernel's exact tile shapes."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    in_dtype = {"int8": jnp.int8, "bf16": jnp.bfloat16}[in_dtype_name]
    acc_dtype = jnp.int32 if in_dtype == jnp.int8 else jnp.float32
    TM = 512

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )

    rng = np.random.default_rng(0)
    a = jnp.asarray(
        rng.integers(-127, 127, (M, K)) if in_dtype == jnp.int8
        else rng.standard_normal((M, K)), in_dtype
    )
    b = jnp.asarray(
        rng.integers(-127, 127, (K, N)) if in_dtype == jnp.int8
        else rng.standard_normal((K, N)), in_dtype
    )

    f = jax.jit(lambda a, b: jnp.sum(pl.pallas_call(
        kernel,
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
    )(a, b).astype(jnp.float32)))
    try:
        float(f(a, b))
    except Exception as e:
        print(json.dumps({
            "measure": f"pallas_mm_M{M}_K{K}_N{N}", "mode": in_dtype_name,
            "error": str(e)[:200],
        }))
        return
    dt = _steady(lambda i: f(a, b), n_warm=20, n=50)
    flops = 2 * M * K * N
    print(json.dumps({
        "measure": f"pallas_mm_M{M}_K{K}_N{N}", "mode": in_dtype_name,
        "us": round(dt * 1e6, 1),
        "tflops_per_s": round(flops / dt / 1e12, 1),
        "util_vs_peak": round(
            flops / dt / (394e12 if in_dtype_name == "int8" else 197e12), 3
        ),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="0,1,2,3")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--modes", default="bf16,int8")
    ap.add_argument("--matmuls", action="store_true",
                    help="also run the raw Pallas matmul microbenches")
    args = ap.parse_args()

    from parallelwavegan_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    if args.matmuls:
        # contraction/N shapes the stage kernel would use:
        #   C=32: K=3*32..11*32, N=32 | C=64: K=192, N=64 | C=128: K=384
        for dt in ("int8", "bf16"):
            pallas_matmul_bench(131072, 96, 32, dt)
            pallas_matmul_bench(131072, 352, 32, dt)
            pallas_matmul_bench(65536, 192, 64, dt)
            pallas_matmul_bench(32768, 384, 128, dt)
            pallas_matmul_bench(32768, 128, 128, dt)
    for s in [int(x) for x in args.stages.split(",") if x != ""]:
        for mode in args.modes.split(","):
            stage_bench(s, args.batch, mode)


if __name__ == "__main__":
    main()
