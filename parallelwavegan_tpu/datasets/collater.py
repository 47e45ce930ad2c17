"""Batch collater: random fixed-window cropping into static-shape,
channels-last numpy batches (behavioral parity:
/root/reference/parallel_wavegan/bin/train.py:650-944).

Every batch has identical shapes per config — the property that keeps the
jitted train step compile-once. RNG is an explicit np.random.Generator so
multi-host runs can derive deterministic, host-disjoint streams.

Output dict (channels-last):
  mel2wav: {"c": (B, T'+2ctx, C), "y": (B, T, 1)} + optional
    {"z": (B, T, 1)}, {"f0": (B, T', 1)}, {"excitation": (B, T, 1)}
  wav2wav (VQ): {"y": (B, T, 1)} + optional {"l": (B, T', C)}, {"g": (B,)}
  duration: {"c": (B, T', 1|2) int tokens, "ds": (B, T') int}
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class Collater:
    def __init__(
        self,
        batch_max_steps: int = 20480,
        hop_size: Optional[int] = 256,
        aux_context_window: int = 2,
        use_noise_input: bool = False,
        use_f0: bool = False,
        use_f0_and_excitation: bool = False,
        use_aux_input: bool = True,
        use_duration: bool = False,
        use_global_condition: bool = False,
        use_local_condition: bool = False,
        pad_value: int = 0,
        max_num_frames: Optional[int] = None,
        rng: Optional[np.random.Generator] = None,
    ):
        if hop_size is not None:
            if batch_max_steps % hop_size != 0:
                batch_max_steps += -(batch_max_steps % hop_size)
            assert batch_max_steps % hop_size == 0
            self.hop_size = hop_size
            self.batch_max_frames = batch_max_steps // hop_size
        self.batch_max_steps = batch_max_steps
        self.aux_context_window = aux_context_window
        self.use_noise_input = use_noise_input
        self.use_f0 = use_f0
        self.use_f0_and_excitation = use_f0_and_excitation
        self.use_aux_input = use_aux_input
        self.use_duration = use_duration
        self.use_global_condition = use_global_condition
        self.use_local_condition = use_local_condition
        self.pad_value = pad_value
        self.max_num_frames = max_num_frames
        self.rng = rng or np.random.default_rng()

        if self.use_aux_input or self.use_local_condition:
            self.start_offset = aux_context_window
            self.end_offset = -(self.batch_max_frames + aux_context_window)
            self.mel_threshold = self.batch_max_frames + 2 * aux_context_window
        else:
            self.start_offset = 0
            self.end_offset = -self.batch_max_steps
            self.audio_threshold = self.batch_max_steps

    # ------------------------------------------------------------------
    def __call__(self, batch: List) -> Dict[str, np.ndarray]:
        if self.use_duration:
            return self._duration_batch(batch)
        if self.use_local_condition or self.use_global_condition or (
            not self.use_aux_input
        ):
            return self._audio_batch(batch)
        return self._mel2wav_batch(batch)

    # ------------------------------------------------------------------
    def _mel2wav_batch(self, batch):
        batch = [
            self._adjust_length(*b)
            for b in batch
            if len(b[1]) > self.mel_threshold
        ]
        assert len(batch) > 0, "all utterances shorter than the mel threshold"
        xs = [b[0] for b in batch]
        cs = [b[1] for b in batch]

        c_lengths = [len(c) for c in cs]
        start_frames = np.array(
            [
                self.rng.integers(self.start_offset, cl + self.end_offset)
                for cl in c_lengths
            ]
        )
        x_starts = start_frames * self.hop_size
        x_ends = x_starts + self.batch_max_steps
        c_starts = start_frames - self.aux_context_window
        c_ends = start_frames + self.batch_max_frames + self.aux_context_window

        y = np.stack(
            [x[s:e] for x, s, e in zip(xs, x_starts, x_ends)]
        ).astype(np.float32)[..., None]
        c = np.stack(
            [c[s:e] for c, s, e in zip(cs, c_starts, c_ends)]
        ).astype(np.float32)

        out = {"y": y, "c": c}
        if self.use_noise_input:
            out["z"] = self.rng.standard_normal(y.shape).astype(np.float32)
        if self.use_f0 or self.use_f0_and_excitation:
            fs = [b[2] for b in batch]
            f = np.stack(
                [f[s:e] for f, s, e in zip(fs, c_starts, c_ends)]
            ).astype(np.float32)
            out["f0"] = f.reshape(f.shape[0], f.shape[1], 1)
        if self.use_f0_and_excitation:
            # reference contract (bin/train.py:766-775): excitation dumps
            # are (#frames, hop_size) and are cropped with the FRAME window
            # incl. the aux context (c_starts:c_ends), then flattened —
            # with aux_context_window=0 this equals the waveform window.
            # 1-D audio-rate dumps (our pre-r2 format) are reshaped first.
            es = [
                e.reshape(-1, self.hop_size) if e.ndim == 1 else e
                for e in (b[3] for b in batch)
            ]
            e = np.stack(
                [e[s:ee] for e, s, ee in zip(es, c_starts, c_ends)]
            ).astype(np.float32)
            out["excitation"] = e.reshape(e.shape[0], -1, 1)
        return out

    def _adjust_length(self, x, c, *args):
        """Pad audio so len(x) == len(c) * hop (the framework invariant)."""
        if len(x) < len(c) * self.hop_size:
            x = np.pad(x, (0, len(c) * self.hop_size - len(x)), mode="edge")
        elif len(x) > len(c) * self.hop_size:
            x = x[: len(c) * self.hop_size]
        assert len(x) == len(c) * self.hop_size
        return (x, c) + args

    # ------------------------------------------------------------------
    def _audio_batch(self, batch):
        """VQ / wav2wav path: crop raw audio windows (+ local/global cond)."""
        if self.use_local_condition:
            items = [b for b in batch if len(b[1]) > self.mel_threshold]
            xs = [self._adjust_length(b[0], b[1])[0] for b in items]
            ls = [b[1] for b in items]
            c_lengths = [len(c) for c in ls]
            start_frames = np.array(
                [
                    self.rng.integers(self.start_offset, cl + self.end_offset)
                    for cl in c_lengths
                ]
            )
            x_starts = start_frames * self.hop_size
            y = np.stack(
                [x[s : s + self.batch_max_steps] for x, s in zip(xs, x_starts)]
            ).astype(np.float32)[..., None]
            c_starts = start_frames - self.aux_context_window
            c_ends = start_frames + self.batch_max_frames + self.aux_context_window
            l = np.stack(
                [c[s:e] for c, s, e in zip(ls, c_starts, c_ends)]
            ).astype(np.float32)
            out = {"y": y, "l": l}
            if self.use_global_condition:
                out["g"] = np.array([b[2] for b in items]).reshape(-1)
            return out

        gs = None
        if self.use_global_condition:
            gs = [b[1] for b in batch]
            batch = [b[0] for b in batch]
        xs = [x for x in batch if len(x) > self.audio_threshold]
        assert len(xs) > 0
        starts = [
            self.rng.integers(0, len(x) - self.batch_max_steps) for x in xs
        ]
        y = np.stack(
            [x[s : s + self.batch_max_steps] for x, s in zip(xs, starts)]
        ).astype(np.float32)[..., None]
        out = {"y": y}
        if gs is not None:
            out["g"] = np.array(gs).reshape(-1)
        return out

    # ------------------------------------------------------------------
    def _duration_batch(self, batch):
        """Discrete-token path: unique-consecutive symbols + durations,
        padded to the longest (or max_num_frames) in the batch."""
        batch = [
            self._adjust_length(*b)
            for b in batch
            if len(b[1]) > self.mel_threshold
        ]
        xs = [b[0] for b in batch]
        cs = [b[1] for b in batch]
        c_lengths = [len(c) for c in cs]
        start_frames = np.array(
            [
                self.rng.integers(self.start_offset, cl + self.end_offset)
                for cl in c_lengths
            ]
        )
        x_starts = start_frames * self.hop_size
        y = np.stack(
            [x[s : s + self.batch_max_steps] for x, s in zip(xs, x_starts)]
        ).astype(np.float32)[..., None]
        c_starts = start_frames - self.aux_context_window
        c_ends = start_frames + self.batch_max_frames + self.aux_context_window

        codes, durs = [], []
        for c, s, e in zip(cs, c_starts, c_ends):
            window = np.asarray(c[s:e])
            if window.ndim == 1:
                window = window[:, None]
            # unique_consecutive over rows
            change = np.any(window[1:] != window[:-1], axis=-1)
            boundaries = np.flatnonzero(np.concatenate([[True], change]))
            code = window[boundaries]
            d = np.diff(np.concatenate([boundaries, [len(window)]]))
            codes.append(code)
            durs.append(d)
        max_len = self.max_num_frames or max(len(c) for c in codes)
        c_batch = np.full(
            (len(codes), max_len, codes[0].shape[-1]), self.pad_value,
            dtype=np.int32,
        )
        d_batch = np.zeros((len(codes), max_len), dtype=np.int32)
        for i, (code, d) in enumerate(zip(codes, durs)):
            n = min(len(code), max_len)
            c_batch[i, :n] = code[:n]
            d_batch[i, :n] = d[:n]
        return {"y": y, "c": c_batch, "ds": d_batch}
