"""Public inference API: load a trained model and synthesize waveforms.

The analogue of the reference's `utils.load_model` + `model.inference`
(/root/reference/parallel_wavegan/utils/utils.py:294-360,
bin/decode.py:148-270): reads config.yml next to the checkpoint, builds the
generator, loads weights (our msgpack checkpoints or reference torch .pkl),
folds weight norm (remove_weight_norm analogue), registers mean/scale stats,
and attaches PQMF synthesis for multi-band models.

TPU improvement over the reference: `synthesize_batch` pads a list of mels to
a shared bucket length and runs them as one batched jit call.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.layers import PQMF
from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.utils.io import load_config, read_hdf5
from parallelwavegan_tpu.utils.params import fold_weight_norm


def _version_leq(a: str, b: str) -> bool:
    """Dotted-version compare (LooseVersion analogue for the back-compat
    shim; non-numeric components compare as 0)."""

    def parts(v: str) -> List[int]:
        out = []
        for p in str(v).replace("-", ".").split("."):
            try:
                out.append(int(p))
            except ValueError:
                out.append(0)
        return out

    pa, pb = parts(a), parts(b)
    n = max(len(pa), len(pb))
    pa += [0] * (n - len(pa))
    pb += [0] * (n - len(pb))
    return pa <= pb


class InferenceModel:
    """Generator + folded params + stats + (optional) PQMF."""

    def __init__(self, config: Dict[str, Any], variables: Dict[str, Any],
                 fold_norm: bool = True, dtype=None, pcm16: bool = False):
        gen_params = dict(config.get("generator_params", {}))
        # reference back-compat: fix the upsample_kernal_sizes typo
        # (utils/utils.py:319-324)
        if "upsample_kernal_sizes" in gen_params:
            gen_params["upsample_kernel_sizes"] = gen_params.pop(
                "upsample_kernal_sizes"
            )
        self.config = config
        gen_type = config.get("generator_type", "ParallelWaveGANGenerator")
        if fold_norm and gen_params.get("use_weight_norm", True):
            variables = dict(variables)
            variables["params"] = fold_weight_norm(variables["params"])
            gen_params["use_weight_norm"] = False
        from parallelwavegan_tpu.engine.build import _to_hashable

        self.generator = get_model_class(gen_type)(**_to_hashable(gen_params))
        # cast float params to the compute dtype unconditionally: a .gckpt
        # may be stored in bf16 (storage compression) while computing in
        # f32, and mixed param/input dtypes fail inside lax convs
        compute_dtype = dtype or jnp.float32
        variables = jax.tree.map(
            # jnp.issubdtype, not np: ml_dtypes bfloat16 (bf16-stored
            # .gckpt) is not an np.floating subclass
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(np.asarray(x).dtype, jnp.floating) else x,
            variables,
        )
        self.variables = variables
        self.dtype = compute_dtype
        self.mean: Optional[np.ndarray] = None
        self.scale: Optional[np.ndarray] = None
        out_ch = gen_params.get("out_channels", 1)
        # reference back-compat: checkpoints trained with
        # parallel_wavegan <= 0.4.2 used the old PQMF prototype defaults
        # (taps 62, cutoff 0.15, beta 9.0 — reference utils/utils.py:350-357)
        pqmf_defaults: Dict[str, Any] = {}
        if _version_leq(config.get("version", "0.1.0"), "0.4.2"):
            pqmf_defaults = {"taps": 62, "cutoff_ratio": 0.15, "beta": 9.0}
        self.pqmf = (
            PQMF(subbands=out_ch, **config.get("pqmf_params", pqmf_defaults))
            if out_ch > 1
            else None
        )
        self.gen_type = gen_type
        self.upsample_factor = self._upsample_factor(gen_params)
        self._jit_cache: Dict[Any, Any] = {}
        # bumped whenever a call needs a shape not seen before (i.e. the
        # call pays jit tracing + compilation); lets callers separate
        # first-call from steady-state timing honestly
        self.compile_events = 0
        # int8 activation scales for the HiFiGAN serving path (see
        # quantize_int8); None = full-precision forward
        self._int8_scales = None
        # pcm16=True converts the waveform to int16 PCM ON DEVICE (the
        # sample format decode writes anyway) — synthesize_batch/inference
        # then return int16 arrays and the device->host readback moves
        # half the bytes. The conversion matches utils.io.write_wav
        # (clip to [-1,1], *32767, truncate) to <=1 LSB; measured batch-1
        # latency effect: docs/BENCHMARKS.md (latency table).
        self.pcm16 = bool(pcm16)

    def _upsample_factor(self, gp) -> int:
        if self.gen_type == "ParallelWaveGANGenerator":
            scales = (gp.get("upsample_params") or {}).get(
                "upsample_scales", [4, 4, 4, 4]
            )
        elif self.gen_type == "VQVAE":
            # wav2wav: encoder downsamples, decoder upsamples back -> 1
            scales = []
        else:
            scales = gp.get("upsample_scales", [8, 8, 2, 2])
        out = 1
        for s in scales:
            out *= s
        # multi-band: PQMF synthesis expands by the subband count
        out *= gp.get("out_channels", 1)
        return int(out)

    # ------------------------------------------------------------------
    def register_stats(self, stats: str) -> None:
        """Register mean/scale for de-normalization (h5 or npy)."""
        assert stats.endswith(".h5") or stats.endswith(".npy")
        if stats.endswith(".h5"):
            self.mean = read_hdf5(stats, "mean").reshape(-1)
            self.scale = read_hdf5(stats, "scale").reshape(-1)
        else:
            arr = np.load(stats)
            self.mean = arr[0].reshape(-1)
            self.scale = arr[1].reshape(-1)
        logging.info("Successfully registered stats.")

    # ------------------------------------------------------------------
    def _forward_fn(self, shape_key):
        if shape_key not in self._jit_cache:
            self.compile_events += 1
            gen = self.generator

            if self.gen_type == "ParallelWaveGANGenerator":
                from parallelwavegan_tpu.ops.pallas.pwg_infer import (
                    pwg_fused_forward,
                    supports_fused_inference,
                )

                use_fused = self.config.get("inference_fused_wavenet", "auto")
                if use_fused == "auto":
                    use_fused = (
                        jax.default_backend() not in ("cpu",)
                        and supports_fused_inference(gen)
                    )
                if use_fused:
                    def fn(variables, c, z):
                        return pwg_fused_forward(gen, variables, z, c)
                else:
                    def fn(variables, c, z):
                        y = gen.apply(variables, z, c)
                        return y
            elif self.gen_type == "DiscreteSymbolStyleMelGANGenerator":
                def fn(variables, c, z):
                    return gen.apply(variables, c, z)
            elif "StyleMelGAN" in self.gen_type:
                def fn(variables, c, z):
                    return gen.apply(variables, c, z)
            elif self.gen_type == "DiscreteSymbolDurationGenerator":
                def fn(variables, c, z):
                    # synthesis path: predicted durations (ds=None)
                    y, _ = gen.apply(variables, c, None, True)
                    return y
            elif self.gen_type == "DiscreteSymbolF0Generator":
                def fn(variables, c, z):
                    # z carries f0 (B, T', 1) for this family
                    return gen.apply(variables, c, z)
            elif self.gen_type == "UHiFiGANGenerator":
                def fn(variables, c, z):
                    # z = (f0, excitation)
                    f0, excitation = z
                    return gen.apply(variables, c, f0, excitation)
            elif (
                self.gen_type == "HiFiGANGenerator"
                and self._int8_scales is not None
            ):
                from parallelwavegan_tpu.ops.hifigan_infer import (
                    hifigan_fast_forward,
                )

                scales = self._int8_scales

                def fn(variables, c, z):
                    return hifigan_fast_forward(gen, variables, c,
                                                scales=scales)
            else:
                def fn(variables, c, z):
                    y = gen.apply(variables, c)
                    if self.pqmf is not None:
                        y = self.pqmf.synthesis(y)
                    return y

            if self.pcm16:
                raw_fn = fn

                def fn(variables, c, z):
                    y = raw_fn(variables, c, z)
                    # f32 before scaling: bf16's 8-bit mantissa would
                    # quantize worse than the 16-bit target format
                    y = jnp.clip(y.astype(jnp.float32), -1.0, 1.0) * 32767.0
                    return y.astype(jnp.int16)

            self._jit_cache[shape_key] = jax.jit(fn)
        return self._jit_cache[shape_key]

    def quantize_int8(self, calib_mels, schedule: str = "auto") -> None:
        """Enable the int8-activation HiFiGAN serving mode.

        One calibration pass over representative (normalized) mels records
        per-tensor max|x| of every MRF conv input; subsequent synthesize_
        batch/inference calls run those convs with int8 activations and
        weights (ops/hifigan_infer.py — the int8x8 MXU path plus a halved
        HBM byte stream). Throughput and copy-synthesis quality deltas are
        recorded in docs/VALIDATION.md ("int8 serving mode").

        schedule: 'auto' (default) = the measured-best mixed schedule —
        int8 on the wide (C>=128) MRF stages and every upsample deconv,
        bf16 on the streaming-bound small-C stages; 'all' = quantize
        everything calibrated (round-3 behavior). See
        ops/hifigan_infer.py filter_scales_schedule.
        """
        from parallelwavegan_tpu.ops.hifigan_infer import (
            calibrate,
            filter_scales_schedule,
            supports_fast_inference,
        )

        if self.gen_type != "HiFiGANGenerator":
            raise ValueError(
                f"int8 serving supports HiFiGANGenerator, not {self.gen_type}"
            )
        if not supports_fast_inference(self.generator):
            raise ValueError(
                "int8 serving requires a non-causal HiFiGAN generator"
            )
        if self.pqmf is not None:
            # the int8 forward returns the raw generator output; it never
            # applies PQMF synthesis, so a multi-band config would silently
            # produce subband audio cropped with a PQMF-expanded
            # upsample_factor — wrong content AND length
            raise ValueError(
                "int8 serving does not support multi-band (PQMF) generators"
            )
        cs = [np.asarray(c, np.float32) for c in calib_mels]
        bucket = max(len(c) for c in cs)
        batch = np.stack(
            [np.pad(c, ((0, bucket - len(c)), (0, 0)), mode="edge")
             for c in cs]
        ).astype(self.dtype)
        self._int8_scales = filter_scales_schedule(
            calibrate(self.generator, self.variables, jnp.asarray(batch)),
            self.generator, schedule,
        )
        self._jit_cache.clear()  # full-precision fns are stale now

    def inference(self, c: np.ndarray, normalize_before: bool = False,
                  rng: Optional[jax.Array] = None,
                  f0: Optional[np.ndarray] = None,
                  excitation: Optional[np.ndarray] = None) -> np.ndarray:
        """Mel (T', C) -> wave (T, out_channels) as float32 numpy.

        bucket_size=1: no tail padding, exact parity with the reference's
        single-utterance decode. Discrete-token / f0 / excitation variants
        route through exact-shape single-utterance paths (reference
        bin/decode.py:236-255).
        """
        if self.gen_type in (
            "DiscreteSymbolHiFiGANGenerator",
            "DiscreteSymbolDurationGenerator",
            "DiscreteSymbolF0Generator",
            "DiscreteSymbolStyleMelGANGenerator",
            "UHiFiGANGenerator",
        ):
            return self._inference_special(c, rng, f0, excitation)
        return self.synthesize_batch([c], normalize_before, rng,
                                     bucket_size=1)[0]

    def _cached_jit(self, tag, shapes, make_fn):
        """Per-shape jit cache (a fresh jax.jit(lambda ...) every call would
        re-trace each utterance; compile_events tracks cold calls)."""
        key = (tag, shapes)
        if key not in self._jit_cache:
            self.compile_events += 1
            self._jit_cache[key] = jax.jit(make_fn())
        return self._jit_cache[key]

    def _inference_special(self, c, rng, f0, excitation) -> np.ndarray:
        """Single-utterance path for token / f0 / excitation generators."""
        gen = self.generator
        c = np.asarray(c)[None]  # (1, T', C)
        if c.ndim == 2:
            c = c[..., None]
        # float inputs must match the param dtype (--dtype bfloat16 casts
        # params; mixed param/input dtypes fail inside lax convs) — token
        # id inputs stay integer
        if np.issubdtype(c.dtype, np.floating):
            c = c.astype(self.dtype)
        if f0 is not None:
            f0 = np.asarray(f0, self.dtype)
        if excitation is not None:
            excitation = np.asarray(excitation, self.dtype)
        if self.gen_type == "DiscreteSymbolDurationGenerator":
            y, ds_out = self._cached_jit(
                "dur", c.shape, lambda: lambda v, c: gen.apply(v, c, None, True)
            )(self.variables, c)
            # predicted integer durations decide the true output length
            # (reference layers/duration_predictor.py inference: exp-offset)
            offset = getattr(gen, "duration_offset", 1.0)
            ds = np.clip(
                np.round(np.exp(np.asarray(ds_out)) - offset), 0, None
            ).astype(np.int64)
            n = int(ds.sum()) * self.upsample_factor
            return np.asarray(y, np.float32)[0, :n]
        if self.gen_type == "DiscreteSymbolF0Generator" and f0 is not None:
            f0 = np.asarray(f0, self.dtype).reshape(1, -1, 1)
            y = self._cached_jit(
                "f0", (c.shape, f0.shape),
                lambda: lambda v, c, f: gen.apply(v, c, f),
            )(self.variables, c, f0)
            return np.asarray(y, np.float32)[0]
        if self.gen_type == "UHiFiGANGenerator":
            assert excitation is not None, "UHiFiGAN requires excitation"
            f0_in = (
                np.asarray(f0, self.dtype).reshape(1, -1, 1)
                if f0 is not None else None
            )
            exc = np.asarray(excitation, self.dtype).reshape(1, -1, 1)
            y = self._cached_jit(
                "uhifigan",
                (c.shape, None if f0_in is None else f0_in.shape, exc.shape),
                lambda: lambda v, c, f, e: gen.apply(v, c, f, e),
            )(self.variables, c.astype(self.dtype), f0_in, exc)
            return np.asarray(y, np.float32)[0]
        if self.gen_type == "DiscreteSymbolStyleMelGANGenerator":
            if rng is None:
                rng = jax.random.key(0)
            nf = int(np.prod(gen.noise_upsample_scales))
            frames = (c.shape[1] - 1) // nf + 1
            pad = frames * nf - c.shape[1]
            cp = np.pad(c, ((0, 0), (0, pad), (0, 0)), mode="edge")
            z = jax.random.normal(rng, (1, 1, gen.in_channels))
            y = self._cached_jit(
                "style_tok", (cp.shape, z.shape),
                lambda: lambda v, c, z: gen.apply(v, c, z),
            )(self.variables, cp, z)
            n = c.shape[1] * self.upsample_factor
            return np.asarray(y, np.float32)[0, :n]
        y = self._cached_jit(
            "plain", c.shape, lambda: lambda v, c: gen.apply(v, c)
        )(self.variables, c)
        return np.asarray(y, np.float32)[0]

    # -- VQVAE (wav2wav) path ------------------------------------------
    def vq_encode(self, audio: np.ndarray) -> np.ndarray:
        """Audio (T,) -> codebook indices (T'',) (reference
        models/vqvae.py:113-125, bin/decode.py:366-385)."""
        x = np.asarray(audio, np.float32).reshape(1, -1, 1)
        key = ("vq_encode", x.shape)
        if key not in self._jit_cache:
            self.compile_events += 1
            self._jit_cache[key] = jax.jit(
                lambda v, x: self.generator.apply(
                    v, x, method=self.generator.encode
                )
            )
        idx = self._jit_cache[key](self.variables, x)
        return np.asarray(idx)[0]

    def vq_decode(self, indices: np.ndarray, l=None, g=None) -> np.ndarray:
        """Codebook indices -> wave (+ optional local/global conditioning)."""
        idx = np.asarray(indices, np.int32)[None]
        l_in = None if l is None else np.asarray(l, np.float32)[None]
        g_in = None if g is None else np.asarray(g, np.int32).reshape(1)
        key = (
            "vq_decode", idx.shape,
            None if l_in is None else l_in.shape, g_in is not None,
        )
        if key not in self._jit_cache:
            self.compile_events += 1
            self._jit_cache[key] = jax.jit(
                lambda v, i, l, g: self.generator.apply(
                    v, i, l, g, method=self.generator.decode
                )
            )
        y = self._jit_cache[key](self.variables, idx, l_in, g_in)
        y = np.asarray(y, np.float32)
        if self.pqmf is not None:
            import jax.numpy as _jnp

            y = np.asarray(self.pqmf.synthesis(_jnp.asarray(y)), np.float32)
        return y[0]

    def inference_chunked(
        self,
        c: np.ndarray,
        chunk_frames: int = 256,
        context_frames: int = 64,
        normalize_before: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> np.ndarray:
        """Memory-bounded long-utterance synthesis by overlap-chunking
        with receptive-field halos (the TPU answer to arbitrarily long
        sequences — the reference runs the whole utterance through the conv
        stack in one shot, reference models/*.py inference; see SURVEY §5).

        Each chunk is synthesized from a window with `context_frames` of
        real neighboring mel frames on each side; conv border effects only
        corrupt outputs within the receptive field of a window edge, so the
        cropped interior is EXACT (bit-equal to a full-utterance forward for
        deterministic generators) whenever context_frames*hop exceeds the
        generator's receptive field. Windows share at most three shapes, so
        an arbitrarily long utterance costs a bounded number of compiles
        and a bounded peak memory.

        For noise-driven generators: Parallel WaveGAN draws a fresh z per
        chunk (distributionally identical to the full-utterance draw but
        not bit-equal); StyleMelGAN draws the FULL utterance's noise grid
        once (same key/shape as synthesize_batch) and slices it per chunk
        with chunk/context sizes rounded up to the noise-upsample grid
        (end-of-audio pop-noise crop semantics preserved — reference
        models/style_melgan.py:227-238). StyleMelGAN output is CLOSE but
        not bit-equal to the full forward: TADE layers instance-normalize
        over the whole time axis (reference tade_res_block.py:30), so the
        generator is not time-invariant and each window sees slightly
        different normalization statistics. The error shrinks with window
        size (statistics are means over the window; measured ~1e-3
        relative RMS at 224-frame windows in the regression test) and is
        unconditionally free of seam discontinuities beyond that bound.

        Multi-band (PQMF) MelGAN is supported: upsample_factor includes
        the subband expansion and the context halo covers the PQMF
        synthesis FIR (62 taps << one mel frame's worth of halo).
        """
        assert self.gen_type in (
            "ParallelWaveGANGenerator",
            "MelGANGenerator",
            "HiFiGANGenerator",
            "StyleMelGANGenerator",
        ), f"chunked synthesis not supported for {self.gen_type}"
        c = np.asarray(c, dtype=np.float32)
        if normalize_before:
            assert self.mean is not None, "register_stats first"
            c = (c - self.mean) / self.scale
        T = len(c)
        if rng is None:
            rng = jax.random.key(0)
        up = self.upsample_factor
        if self.gen_type == "StyleMelGANGenerator":
            return self._inference_chunked_style(
                c, chunk_frames, context_frames, rng
            )
        if T <= chunk_frames + 2 * context_frames:
            return self.inference(c, rng=rng)
        window = chunk_frames + 2 * context_frames
        outs = []
        for a in range(0, T, chunk_frames):
            b = min(a + chunk_frames, T)
            # uniform interior/tail window size -> bounded jit cache
            lo = max(0, min(a - context_frames, T - window))
            hi = min(T, lo + window) if lo > 0 else b + context_frames
            rng, sub = jax.random.split(rng)
            y = self.synthesize_batch([c[lo:hi]], rng=sub, bucket_size=1)[0]
            outs.append(y[(a - lo) * up : (b - lo) * up])
        return np.concatenate(outs, axis=0)

    def _inference_chunked_style(self, c, chunk_frames, context_frames,
                                 rng) -> np.ndarray:
        """StyleMelGAN chunking on the noise grid (see inference_chunked).

        Every boundary (chunk starts, context halo, window size, total
        padded length) is a multiple of noise_upsample_factor mel frames,
        so each window's mel slice pairs with a contiguous slice of the
        one full-utterance noise draw; TADE blocks are time-invariant
        convs, so cropped interiors match the full forward exactly.
        """
        nf = int(self.generator.noise_upsample_factor)
        up = self.upsample_factor

        def align(n):
            return -(-n // nf) * nf

        T = len(c)
        chunk = align(max(chunk_frames, 1))
        ctx = align(max(context_frames, 1))
        T_pad = align(T)
        # mirror synthesize_batch's bucket padding (bucket_size=1 -> pad
        # straight to the noise grid) so full-vs-chunked use the same
        # noise shape AND values for a given rng
        c_pad = np.pad(c, ((0, T_pad - T), (0, 0)), mode="edge")
        n_frames = T_pad // nf
        z_full = jax.random.normal(
            rng, (1, n_frames, self.generator.in_channels), dtype=self.dtype
        )
        if T_pad <= chunk + 2 * ctx:
            y = self._style_window(c_pad, z_full)
            return y[: T * up]
        window = chunk + 2 * ctx
        outs = []
        for a in range(0, T_pad, chunk):
            b = min(a + chunk, T_pad)
            # all quantities are nf-multiples, so lo/hi stay grid-aligned
            lo = max(0, min(a - ctx, T_pad - window))
            hi = min(T_pad, lo + window) if lo > 0 else b + ctx
            y = self._style_window(
                c_pad[lo:hi], z_full[:, lo // nf : hi // nf]
            )
            outs.append(y[(a - lo) * up : (b - lo) * up])
        return np.concatenate(outs, axis=0)[: T * up]

    def _style_window(self, c_window, z_window) -> np.ndarray:
        """One StyleMelGAN window with an explicit noise slice."""
        padded = c_window[None].astype(self.dtype)
        fn = self._forward_fn((padded.shape, True))
        y = np.asarray(
            fn(self.variables, jnp.asarray(padded), z_window),
            dtype=np.int16 if self.pcm16 else np.float32,
        )
        return y[0]

    def prepare_batch(
        self,
        cs: Sequence[np.ndarray],
        normalize_before: bool = False,
        rng: Optional[jax.Array] = None,
        bucket_size: int = 64,
    ):
        """Host-side prep for one batched synthesis call: pad mels to a
        shared bucket length, draw noise if the family needs it, and
        resolve the jitted forward. Returns (fn, args, lengths) with
        `fn(*args)` the device call — exposed so callers (bench.py's
        latency split) can time dispatch/compute/readback separately;
        synthesize_batch is prepare + call + crop."""
        if rng is None:
            rng = jax.random.key(0)
        cs = [np.asarray(c, dtype=np.float32) for c in cs]
        if normalize_before:
            assert self.mean is not None, "register_stats first"
            cs = [(c - self.mean) / self.scale for c in cs]
        lengths = [len(c) for c in cs]
        bucket = -(-max(lengths) // bucket_size) * bucket_size
        ctx = 0
        if self.gen_type == "ParallelWaveGANGenerator":
            ctx = self.config.get("generator_params", {}).get(
                "aux_context_window", 2
            )
        padded = np.stack(
            [
                np.pad(c, ((ctx, bucket - len(c) + ctx), (0, 0)), mode="edge")
                for c in cs
            ]
        ).astype(self.dtype)
        z = None
        if self.gen_type == "ParallelWaveGANGenerator":
            z = jax.random.normal(
                rng,
                (len(cs), bucket * self.upsample_factor, 1),
                dtype=self.dtype,
            )
        elif "StyleMelGAN" in self.gen_type:
            # pad mel to the noise-upsample grid (kills end-of-audio pops,
            # reference style_melgan.py:227-238)
            nf = self.generator.noise_upsample_factor
            frames = (bucket - 1) // nf + 1
            padded = np.pad(
                padded, ((0, 0), (0, frames * nf - bucket), (0, 0)),
                mode="edge",
            )
            # one noise frame per noise_upsample_factor mel frames
            # (reference style_melgan.py:216-221; a single frame only
            # covers mels up to one factor long — the training crop size)
            z = jax.random.normal(
                rng, (len(cs), frames, self.generator.in_channels),
                dtype=self.dtype,
            )
        fn = self._forward_fn((padded.shape, z is not None))
        return fn, (self.variables, jnp.asarray(padded), z), lengths

    def synthesize_batch(
        self,
        cs: Sequence[np.ndarray],
        normalize_before: bool = False,
        rng: Optional[jax.Array] = None,
        bucket_size: int = 64,
    ) -> List[np.ndarray]:
        """Batched synthesis: pad mels to a shared bucket length, one jit
        call per bucket shape, crop outputs to true lengths. Output dtype
        is float32, or int16 when the model was built with pcm16=True."""
        fn, args, lengths = self.prepare_batch(
            cs, normalize_before, rng, bucket_size
        )
        y = np.asarray(
            fn(*args), dtype=np.int16 if self.pcm16 else np.float32
        )
        return [
            y[i, : lengths[i] * self.upsample_factor]
            for i in range(len(lengths))
        ]


def load_model(
    checkpoint: str,
    config: Optional[Dict[str, Any]] = None,
    stats: Optional[str] = None,
    fold_norm: bool = True,
    dtype=None,
    use_ema: bool = False,
    pcm16: bool = False,
) -> InferenceModel:
    """Load an InferenceModel from our .ckpt or a reference torch .pkl.

    use_ema=True serves the EMA generator weights from a .ckpt trained
    with generator_ema_decay (or a .gckpt exported with use_ema=True is
    already EMA — the flag is for full train-state checkpoints)."""
    if config is None:
        dirname = os.path.dirname(checkpoint)
        config = load_config(os.path.join(dirname, "config.yml"))
    if use_ema and checkpoint.endswith((".pkl", ".gckpt")):
        raise ValueError(
            "use_ema applies to full train-state .ckpt files only (a "
            ".gckpt already holds exactly the params chosen at export; "
            "reference .pkl checkpoints have no EMA stream)"
        )
    if checkpoint.endswith(".pkl"):
        from parallelwavegan_tpu.engine.checkpoint import (
            load_reference_checkpoint,
        )

        variables = load_reference_checkpoint(checkpoint, config)["generator"]
    elif checkpoint.endswith(".gckpt"):
        # generator-only inference checkpoint (no discriminator/optimizer
        # state; engine.checkpoint.save_generator_checkpoint)
        from parallelwavegan_tpu.engine.checkpoint import (
            load_generator_checkpoint,
        )

        variables = load_generator_checkpoint(checkpoint)
    else:
        from parallelwavegan_tpu.engine.build import init_train_state
        from parallelwavegan_tpu.engine.checkpoint import load_checkpoint

        # abstract template: never materializes params or compiles on device
        template = jax.eval_shape(
            lambda: init_train_state(config, jax.random.key(0))[0]
        )
        if use_ema and float(
            config.get("generator_ema_decay", 0.0) or 0.0
        ) <= 0.0:
            raise ValueError(
                "use_ema=True but the checkpoint's config has no "
                "generator_ema_decay — this run kept no EMA stream"
            )
        state = load_checkpoint(checkpoint, template)
        params = state.ema_g if use_ema else state.params_g
        variables = {"params": params, **state.extra_g}
    model = InferenceModel(config, variables, fold_norm=fold_norm,
                           dtype=dtype, pcm16=pcm16)
    if stats is not None:
        model.register_stats(stats)
    return model
