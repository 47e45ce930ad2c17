#!/usr/bin/env python3
"""Raw feature extraction CLI (behavioral parity:
/root/reference/parallel_wavegan/bin/preprocess.py).

Per utterance: [trim silence] -> [dual-sample-rate resample for feats] ->
log-mel filterbank -> edge-pad audio and crop so len(audio) == len(mel) * hop
(the framework-wide alignment invariant) -> [f0 / excitation] ->
write hdf5 (keys wave/feats/f0/excitation) or npy pairs.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml
from tqdm import tqdm

from parallelwavegan_tpu.datasets import AudioDataset, AudioSCPDataset
from parallelwavegan_tpu.ops.audio import log_f0, resample, trim_silence
from parallelwavegan_tpu.utils.io import load_config, read_wav, write_hdf5


def logmelfilterbank(
    audio,
    sampling_rate,
    fft_size=1024,
    hop_size=256,
    win_length=None,
    window="hann",
    num_mels=80,
    fmin=None,
    fmax=None,
    eps=1e-10,
    log_base=10.0,
):
    """Host-side numpy log-mel (no jit/device work — preprocessing handles
    variable-length utterances that would force per-shape recompiles)."""
    from parallelwavegan_tpu.ops.spectral import log_mel_spectrogram_numpy

    return log_mel_spectrogram_numpy(
        audio, sampling_rate, fft_size, hop_size, win_length, window,
        num_mels, fmin, fmax, eps, log_base,
    )


def main():
    parser = argparse.ArgumentParser(
        description="Preprocess audio and extract features "
        "(see parallelwavegan_tpu/bin/preprocess.py)."
    )
    parser.add_argument("--wav-scp", "--scp", default=None, type=str)
    parser.add_argument("--segments", default=None, type=str)
    parser.add_argument("--rootdir", default=None, type=str)
    parser.add_argument("--dumpdir", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--use-f0", action="store_true")
    parser.add_argument(
        "--extract-f0", action="store_true",
        help="dump continuous log-f0 + V/UV as the 'local' feature key "
        "(locally-conditioned VQVAE recipes)",
    )
    parser.add_argument(
        "--utt2spk", default=None, type=str,
        help="kaldi-style utt2spk; with --spk2idx writes a 'global' "
        "speaker-index key for global conditioning (VQVAE recipes)",
    )
    parser.add_argument("--spk2idx", default=None, type=str)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    config = load_config(args.config)

    if (args.wav_scp is None) == (args.rootdir is None):
        raise ValueError("Please specify either --rootdir or --wav-scp.")
    if args.wav_scp is not None:
        dataset = AudioSCPDataset(
            args.wav_scp, segments=args.segments, return_utt_id=True,
            return_sampling_rate=True,
        )
    else:
        dataset = AudioDataset(
            args.rootdir, "*.wav",
            audio_load_fn=read_wav, return_utt_id=True,
        )

    utt2idx = None
    if args.utt2spk is not None:
        assert args.spk2idx is not None, "--utt2spk requires --spk2idx"
        with open(args.utt2spk) as f:
            utt2spk = dict(line.split()[:2] for line in f if line.strip())
        with open(args.spk2idx) as f:
            spk2idx = {
                k: int(v)
                for k, v in (line.split()[:2] for line in f if line.strip())
            }
        utt2idx = {
            u: spk2idx.get(s, max(spk2idx.values()) + 1)
            for u, s in utt2spk.items()
        }

    os.makedirs(args.dumpdir, exist_ok=True)
    fs = config["sampling_rate"]
    hop_size = config["hop_size"]

    for utt_id, audio in tqdm(dataset):
        if isinstance(audio, tuple):
            audio, sr = audio
        else:
            audio, sr = audio
        assert np.abs(audio).max() <= 1.0, (
            f"{utt_id} seems to be different from 16 bit PCM."
        )
        assert sr == fs, (
            f"{utt_id} sampling rate {sr} != config {fs}."
        )

        if config.get("trim_silence", False):
            audio, _ = trim_silence(
                audio,
                top_db=config.get("trim_threshold_in_db", 60),
                frame_length=config.get("trim_frame_size", 2048),
                hop_length=config.get("trim_hop_size", 512),
            )

        # dual-sample-rate path: extract feats at a different rate
        # (reference bin/preprocess.py:369-387)
        sampling_rate_for_feats = config.get("sampling_rate_for_feats")
        if sampling_rate_for_feats is None:
            x = audio
            fs_feat = fs
            hop = hop_size
        else:
            x = resample(audio, fs, sampling_rate_for_feats)
            fs_feat = sampling_rate_for_feats
            assert hop_size * sampling_rate_for_feats % fs == 0, (
                "hop_size must be int after rescaling for dual sampling rate."
            )
            hop = hop_size * sampling_rate_for_feats // fs

        mel = logmelfilterbank(
            x, fs_feat,
            fft_size=config["fft_size"],
            hop_size=hop,
            win_length=config["win_length"],
            window=config["window"],
            num_mels=config["num_mels"],
            fmin=config["fmin"],
            fmax=config["fmax"],
            log_base=config.get("log_base", 10.0),
        )

        # enforce the alignment invariant len(audio) == len(mel) * hop_size
        audio = np.pad(audio, (0, config["fft_size"]), mode="edge")
        audio = audio[: len(mel) * hop_size]
        assert len(mel) * hop_size == len(audio)

        f0 = None
        if args.use_f0 or config.get("use_f0", False):
            # reference contract (bin/preprocess.py:421-430): LOG-domain f0
            # (0 = unvoiced) from torchyin with pitch_min derived from
            # win_length and pitch_max 10000, edge-padded to the mel length
            f0 = log_f0(
                np.pad(audio, (0, hop_size * 2)), fs, hop_size,
                frame_length=config.get("win_length") or None,
            )[: len(mel)]
            f0 = np.pad(f0, (0, len(mel) - len(f0)), mode="edge")

        local = None
        if args.extract_f0:
            from parallelwavegan_tpu.ops.audio import logf0_and_vuv

            local = logf0_and_vuv(
                audio, fs, hop_size,
                pitch_min=config.get("pitch_min", 40),
                pitch_max=config.get("pitch_max", 500),
            )
            if local is None:
                logging.warning(f"{utt_id} is all-unvoiced; skipped.")
                continue
            local = local[: len(mel)]
            local = np.pad(local, ((0, len(mel) - len(local)), (0, 0)),
                           mode="edge")

        excitation = None
        if config.get("use_excitation", False):
            import jax

            from parallelwavegan_tpu.ops.sine import sine_excitation

            assert f0 is not None, "excitation requires f0"
            # preprocess is a host-side tool: keep the excitation math on
            # CPU so parallel feature-extraction jobs never queue on (or
            # pay per-shape compiles for) the accelerator
            # reference-exact extension (bin/preprocess.py:431-440): the
            # LOG-domain f0 contour is TILED hop_size times (repeat on the
            # middle axis of (1,1,N) then flatten), not per-frame repeated,
            # and fed to SineGen as-is — a quirk of the singing-voice fork,
            # reproduced verbatim so excitation dumps interoperate (see
            # docs/PARITY.md)
            extended = np.reshape(
                np.tile(f0[None, :], (hop_size, 1)), (1, -1, 1)
            )
            with jax.default_device(jax.devices("cpu")[0]):
                sines, _, _ = sine_excitation(
                    jax.random.key(hash(utt_id) % (2**31)),
                    extended, fs,
                )
                excitation = np.asarray(sines)[0, :, 0]
            # reference dump shape: (#frames, hop_size)
            excitation = excitation[: len(mel) * hop_size].reshape(
                -1, hop_size
            )

        audio = audio * config.get("global_gain_scale", 1.0)
        if np.abs(audio).max() >= 1.0:
            logging.warning(
                f"{utt_id} causes clipping. It is better to re-consider "
                "global gain scale."
            )
            continue

        if config["format"] == "hdf5":
            path = os.path.join(args.dumpdir, f"{utt_id}.h5")
            write_hdf5(path, "wave", audio.astype(np.float32))
            write_hdf5(path, "feats", mel.astype(np.float32))
            if f0 is not None:
                write_hdf5(path, "f0", f0.astype(np.float32))
            if excitation is not None:
                write_hdf5(path, "excitation", excitation.astype(np.float32))
            if local is not None:
                write_hdf5(path, "local", local.astype(np.float32))
            if utt2idx is not None:
                write_hdf5(
                    path, "global",
                    np.array([utt2idx[utt_id]], dtype=np.int64),
                )
        elif config["format"] == "npy":
            np.save(
                os.path.join(args.dumpdir, f"{utt_id}-wave.npy"),
                audio.astype(np.float32), allow_pickle=False,
            )
            np.save(
                os.path.join(args.dumpdir, f"{utt_id}-feats.npy"),
                mel.astype(np.float32), allow_pickle=False,
            )
            if local is not None:
                np.save(
                    os.path.join(args.dumpdir, f"{utt_id}-local.npy"),
                    local.astype(np.float32), allow_pickle=False,
                )
            if utt2idx is not None:
                np.save(
                    os.path.join(args.dumpdir, f"{utt_id}-global.npy"),
                    np.array([utt2idx[utt_id]], dtype=np.int64),
                    allow_pickle=False,
                )
        else:
            raise ValueError("support only hdf5 or npy format.")


if __name__ == "__main__":
    main()
