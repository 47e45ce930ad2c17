#!/usr/bin/env python3
"""Decode CLI: mel -> waveform with a trained model (behavioral parity:
/root/reference/parallel_wavegan/bin/decode.py:31-394, improved with
batched bucketed synthesis)."""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np
from tqdm import tqdm

from parallelwavegan_tpu.datasets import (
    AudioDataset,
    MelDataset,
    MelF0Dataset,
    MelF0ExcitationDataset,
    MelSCPDataset,
)
from parallelwavegan_tpu.utils.io import load_config, read_hdf5, write_wav
from parallelwavegan_tpu.utils.model_loader import load_model


class _RTFMeter:
    """Separates first-call (jit trace + compile) from steady-state timing.

    The reference reports a single steady-state-by-nature RTF (its torch
    decode pays no compile; bin/decode.py:257-260). Under XLA a cold call
    can be minutes of remote compilation, so one blended RTF is dishonest
    in both directions; we report both, flagging calls during which the
    model compiled a new shape (model.compile_events)."""

    def __init__(self, model):
        self._model = model
        self._last_events = model.compile_events
        self.cold_t = self.cold_audio = 0.0
        self.warm_t = self.warm_audio = 0.0
        self.rtf_sum = 0.0  # reference-style per-utterance RTF average
        self.n_utts = 0
        self.n_cold = 0

    def add(self, elapsed: float, audio_s: float, n_utts: int = 1):
        events = self._model.compile_events
        cold = events != self._last_events
        self._last_events = events
        if cold:
            self.cold_t += elapsed
            self.cold_audio += audio_s
            self.n_cold += 1
        else:
            self.warm_t += elapsed
            self.warm_audio += audio_s
        self.rtf_sum += elapsed / max(audio_s, 1e-9) * n_utts
        self.n_utts += n_utts

    def log(self):
        logging.info(
            f"Finished generation of {self.n_utts} utterances "
            f"(RTF = {self.rtf_sum / max(self.n_utts, 1):.06f})."
        )
        if self.warm_audio > 0:
            rtf = self.warm_t / self.warm_audio
            logging.info(
                f"Steady-state RTF = {rtf:.06f} "
                f"({self.warm_audio / max(self.warm_t, 1e-9):.1f} audio-s/s, "
                f"excluding {self.n_cold} first-call batches)."
            )
        if self.n_cold:
            logging.info(
                f"First-call (incl. jit compile) RTF = "
                f"{self.cold_t / max(self.cold_audio, 1e-9):.06f} over "
                f"{self.n_cold} batches; warm the persistent compile cache "
                f"to amortize."
            )


def main():
    parser = argparse.ArgumentParser(
        description="Decode dumped features with a trained vocoder."
    )
    parser.add_argument("--feats-scp", "--scp", default=None, type=str)
    parser.add_argument("--dumpdir", default=None, type=str)
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--config", default=None, type=str)
    parser.add_argument("--stats", default=None, type=str)
    parser.add_argument("--normalize-before", action="store_true")
    parser.add_argument("--batch-size", default=8, type=int)
    parser.add_argument(
        "--chunk-frames", default=0, type=int,
        help="if > 0, synthesize each utterance in overlap-chunked windows "
        "of this many mel frames (memory-bounded decoding of very long "
        "utterances; exact for conv generators, see "
        "InferenceModel.inference_chunked)",
    )
    parser.add_argument("--use-f0", action="store_true")
    parser.add_argument(
        "--int8", action="store_true",
        help="int8-activation HiFiGAN serving mode: calibrates per-tensor "
        "activation scales on the first --int8-calib-utts mels, then runs "
        "the MRF convs (97%% of the byte stream) with int8 activations and "
        "weights (throughput/quality deltas: docs/VALIDATION.md)",
    )
    parser.add_argument(
        "--int8-calib-utts", default=8, type=int,
        help="number of utterances used for int8 calibration",
    )
    parser.add_argument(
        "--int8-schedule", default="auto", choices=["auto", "all"],
        help="'auto' (default): the measured-best mixed schedule — int8 "
        "on the wide (C>=128) MRF stages + all upsample deconvs, bf16 on "
        "the streaming-bound small-C stages; 'all': quantize every "
        "calibrated conv (docs/BENCHMARKS.md, mixed-precision schedule)",
    )
    parser.add_argument(
        "--dtype", default=None, choices=[None, "float32", "bfloat16"],
        help="compute dtype for synthesis (default float32; bfloat16 is "
        "the bench's serving configuration, ~2x faster on TPU)",
    )
    parser.add_argument(
        "--pcm16", action="store_true",
        help="convert the waveform to 16-bit PCM on device (the sample "
        "format of the output WAVs anyway): halves the device->host "
        "readback bytes, which dominates batch-1 latency on "
        "dispatch-bound deployments (docs/BENCHMARKS.md latency table)",
    )
    parser.add_argument(
        "--use-ema", action="store_true",
        help="serve the EMA generator weights from a .ckpt trained with "
        "generator_ema_decay (GAN-stabilized average; docs/VALIDATION.md)",
    )
    parser.add_argument(
        "--device", default=None, choices=[None, "cpu", "tpu"],
        help="force the JAX platform; 'cpu' decodes on the host (the "
        "reference publishes CPU RTFs too, README.md:155-167 — and it "
        "lets offline eval sweeps run while a chip is busy training). "
        "Default: the platform JAX selects (TPU when present).",
    )
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    if args.device is not None:
        # must run before any jax import initializes a backend; the
        # JAX_PLATFORMS env var is ignored on some TPU plugin images, so
        # set it through the config API. 'tpu' restores automatic platform
        # selection (which prefers the accelerator — whose plugin may
        # register under another name, e.g. 'axon' here) so it overrides
        # an inherited cpu pin rather than silently doing nothing.
        import jax

        jax.config.update(
            "jax_platforms", "cpu" if args.device == "cpu" else ""
        )

    from parallelwavegan_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    # without this every invocation re-pays multi-minute remote XLA
    # compiles; with it steady-state decode matches bench.py's throughput
    enable_persistent_compile_cache()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    config = None
    if args.config is not None:
        config = load_config(args.config)

    if (args.feats_scp is None) == (args.dumpdir is None):
        raise ValueError("Please specify either --dumpdir or --feats-scp.")
    if args.normalize_before and args.stats is None:
        raise ValueError("--normalize-before requires --stats.")

    cfg = config or load_config(
        os.path.join(os.path.dirname(args.checkpoint), "config.yml")
    )
    gen_type = cfg.get("generator_type", "ParallelWaveGANGenerator")
    is_hdf5 = cfg.get("format", "hdf5") == "hdf5"
    use_f0 = args.use_f0 or gen_type == "DiscreteSymbolF0Generator" and (
        cfg.get("generator_params", {}).get("use_f0", True)
    )
    use_f0_and_excitation = gen_type == "UHiFiGANGenerator"

    # fail fast with a clear message instead of a quantize_int8 traceback
    # after dataset loading
    if args.int8:
        if gen_type != "HiFiGANGenerator":
            parser.error(
                f"--int8 supports HiFiGANGenerator checkpoints only "
                f"(got {gen_type})"
            )
        if cfg.get("generator_params", {}).get("out_channels", 1) != 1:
            parser.error(
                "--int8 does not support multi-band (PQMF) generators"
            )
        if args.int8_calib_utts < 1:
            parser.error("--int8-calib-utts must be >= 1")

    if gen_type == "VQVAE":
        # wav2wav path: encode raw audio to codebook indices, then decode
        # (reference bin/decode.py:366-385)
        if is_hdf5:
            dataset = AudioDataset(
                args.dumpdir, "*.h5", lambda f: read_hdf5(f, "wave"),
                return_utt_id=True,
            )
        else:
            dataset = AudioDataset(
                args.dumpdir, "*-wave.npy", np.load, return_utt_id=True
            )
    elif args.feats_scp is not None:
        if use_f0 or use_f0_and_excitation:
            raise ValueError(
                "SCP format is not supported for f0 and excitation."
            )
        dataset = MelSCPDataset(args.feats_scp, return_utt_id=True)
    elif use_f0_and_excitation:
        dataset = (
            MelF0ExcitationDataset(args.dumpdir, return_utt_id=True)
            if is_hdf5
            else MelF0ExcitationDataset(
                args.dumpdir, mel_query="*-feats.npy", mel_load_fn=np.load,
                f0_load_fn=lambda f: np.load(
                    f.replace("-feats.npy", "-f0.npy")
                ),
                excitation_load_fn=lambda f: np.load(
                    f.replace("-feats.npy", "-excitation.npy")
                ),
                return_utt_id=True,
            )
        )
    elif use_f0:
        dataset = (
            MelF0Dataset(args.dumpdir, return_utt_id=True)
            if is_hdf5
            else MelF0Dataset(
                args.dumpdir, mel_query="*-feats.npy", mel_load_fn=np.load,
                f0_load_fn=lambda f: np.load(
                    f.replace("-feats.npy", "-f0.npy")
                ),
                return_utt_id=True,
            )
        )
    else:
        dataset = (
            MelDataset(
                args.dumpdir, "*.h5", lambda f: read_hdf5(f, "feats"),
                return_utt_id=True,
            )
            if is_hdf5
            else MelDataset(
                args.dumpdir, "*-feats.npy", np.load, return_utt_id=True
            )
        )
    logging.info(f"The number of features to be decoded = {len(dataset)}.")

    import jax.numpy as jnp

    dtype = {None: None, "float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        args.dtype
    ]
    model = load_model(args.checkpoint, config, stats=args.stats,
                       dtype=dtype, use_ema=args.use_ema,
                       pcm16=args.pcm16)
    config = model.config
    sr = config.get("sampling_rate", 22050)

    os.makedirs(args.outdir, exist_ok=True)
    items = list(dataset)
    meter = _RTFMeter(model)

    if args.int8:
        if not items:
            raise ValueError(
                "--int8 calibration needs at least one utterance, but the "
                "dataset is empty"
            )
        calib = []
        for item in items[: args.int8_calib_utts]:
            c = item[1]
            if args.normalize_before:
                c = (c - model.mean) / model.scale
            calib.append(np.asarray(c, np.float32))
        logging.info(
            f"Calibrating int8 activation scales on {len(calib)} utterances "
            f"(schedule={args.int8_schedule})."
        )
        model.quantize_int8(calib, schedule=args.int8_schedule)

    if gen_type == "VQVAE":
        # per-utterance encode -> decode; dump discrete symbols like the
        # reference (bin/decode.py:377-385)
        use_local = cfg.get("use_local_condition", False)
        use_global = cfg.get("use_global_condition", False)
        file_by_utt = {
            u: f for u, f in zip(dataset.utt_ids, dataset.audio_files)
        }
        symbol_lines = []
        with tqdm(total=len(items)) as pbar:
            for utt_id, audio in items:
                l = g = None
                if is_hdf5 and (use_local or use_global):
                    path = file_by_utt[utt_id]
                    if use_local:
                        l = read_hdf5(path, "local")
                    if use_global:
                        g = read_hdf5(path, "global").reshape(-1)[0]
                start = time.time()
                indices = model.vq_encode(audio)
                y = model.vq_decode(indices, l=l, g=g)
                elapsed = time.time() - start
                meter.add(elapsed, len(y) / sr)
                write_wav(
                    os.path.join(args.outdir, f"{utt_id}_gen.wav"),
                    y[:, 0], sr,
                )
                symbol_lines.append(
                    utt_id + " " + " ".join(map(str, indices.tolist()))
                )
                pbar.update(1)
        with open(os.path.join(args.outdir, "text"), "w") as f:
            f.write("\n".join(symbol_lines) + "\n")
    elif use_f0 or use_f0_and_excitation or "DiscreteSymbol" in gen_type:
        # exact-shape single-utterance paths
        with tqdm(total=len(items)) as pbar:
            for item in items:
                if use_f0_and_excitation:
                    utt_id, c, f0, excitation = item
                elif use_f0:
                    utt_id, c, f0 = item
                    excitation = None
                else:
                    (utt_id, c), f0, excitation = item, None, None
                start = time.time()
                w = model.inference(
                    c, normalize_before=args.normalize_before,
                    f0=f0, excitation=excitation,
                )
                elapsed = time.time() - start
                meter.add(elapsed, len(w) / sr)
                write_wav(
                    os.path.join(args.outdir, f"{utt_id}_gen.wav"),
                    w[:, 0], sr,
                )
                pbar.update(1)
    elif args.chunk_frames > 0:
        with tqdm(total=len(items)) as pbar:
            for utt_id, c in items:
                start = time.time()
                w = model.inference_chunked(
                    c, chunk_frames=args.chunk_frames,
                    normalize_before=args.normalize_before,
                )
                elapsed = time.time() - start
                meter.add(elapsed, len(w) / sr)
                write_wav(
                    os.path.join(args.outdir, f"{utt_id}_gen.wav"),
                    w[:, 0], sr,
                )
                pbar.update(1)
    else:
        with tqdm(total=len(items)) as pbar:
            for i in range(0, len(items), args.batch_size):
                chunk = items[i : i + args.batch_size]
                utt_ids = [u for u, _ in chunk]
                mels = [m for _, m in chunk]
                start = time.time()
                waves = model.synthesize_batch(
                    mels, normalize_before=args.normalize_before
                )
                elapsed = time.time() - start
                audio_s = sum(len(w) for w in waves) / sr
                meter.add(elapsed, audio_s, n_utts=len(chunk))
                for utt_id, w in zip(utt_ids, waves):
                    write_wav(
                        os.path.join(args.outdir, f"{utt_id}_gen.wav"),
                        w[:, 0], sr,
                    )
                pbar.update(len(chunk))

    meter.log()


if __name__ == "__main__":
    main()
