"""Trainer: the Python-side loop around the jitted SPMD GAN step
(behavioral parity: /root/reference/parallel_wavegan/bin/train.py:50-647).

Responsibilities mirror the reference Trainer: interval-driven logging
(TensorBoard), eval epochs with qualitative wav/plot dumps, checkpoint save/
resume, warm-up gating of G/D updates (selecting the jitted step variant),
and a final checkpoint on exit. Device work stays in engine.step; everything
here is host-side orchestration.
"""

from __future__ import annotations

import logging
import os
import time
from collections import defaultdict, deque
from typing import Any, Dict, Optional

import jax
import numpy as np

from parallelwavegan_tpu.engine import checkpoint as ckpt_lib
from parallelwavegan_tpu.engine.build import init_train_state
from parallelwavegan_tpu.engine.criterion import build_criterion
from parallelwavegan_tpu.engine.step import build_steps, make_generator_forward
from parallelwavegan_tpu.parallel.mesh import make_mesh, replicate, shard_batch


class Trainer:
    def __init__(
        self,
        config: Dict[str, Any],
        train_loader,
        eval_loader=None,
        seed: int = 0,
        outdir: Optional[str] = None,
        mesh=None,
    ):
        self.config = config
        self.outdir = outdir or config.get("outdir", "exp")
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.mesh = mesh or make_mesh()
        self.rng = jax.random.key(seed)

        (state, self.generator, self.discriminator, opt_g, opt_d) = (
            init_train_state(config, self.rng)
        )
        self.criterion = build_criterion(config)
        self.train_step_factory, self.eval_step = build_steps(
            config, self.generator, self.discriminator, self.criterion,
            opt_g, opt_d, mesh=self.mesh,
        )
        self.state = replicate(self.mesh, state)
        self.gen_forward = jax.jit(
            make_generator_forward(config, self.generator)
        )

        self.steps = 0
        self.epochs = 0
        self.finish_train = False
        self._inflight: deque = deque()
        self.total_train_loss: Dict[str, float] = defaultdict(float)
        self.writer = None
        if jax.process_index() == 0 and self.outdir:
            os.makedirs(self.outdir, exist_ok=True)
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(self.outdir)
            except Exception as e:  # pragma: no cover
                logging.warning(f"tensorboard disabled: {e}")

    # ------------------------------------------------------------------
    def _flags(self):
        g_start = self.config.get("generator_train_start_steps", 0)
        d_start = self.config.get("discriminator_train_start_steps", 100000)
        train_g = self.steps > g_start
        use_adv = self.steps > d_start
        train_d = self.steps > d_start
        return train_g, use_adv, train_d

    def _train_step(self, batch):
        train_g, use_adv, train_d = self._flags()
        if not (train_g or train_d):
            # warm-up step that trains nothing: keep the device-side step
            # counter in sync with the host loop
            self.state = self.state.replace(steps=self.state.steps + 1)
            self.steps += 1
            return
        step_fn = self.train_step_factory(train_g, use_adv, train_d)
        batch = shard_batch(self.mesh, batch)
        self._maybe_profile()
        self.state, metrics = step_fn(self.state, batch, self.rng)
        # accumulate on device: float(v) here would force a device->host
        # readback every step (~30 ms through the tunneled TPU) and stall
        # the async dispatch pipeline; values are read back only at
        # log_interval_steps in _check_log_interval
        for k, v in metrics.items():
            self.total_train_loss[f"train/{k}"] += v
        self._accum_steps = getattr(self, "_accum_steps", 0) + 1
        # Bound the async dispatch queue. The host can race hundreds of
        # dispatched steps ahead of the device (epochs over a cached
        # dataset dispatch in ~ms), and the tunneled TPU backend has been
        # observed to wedge outright with a ~250-deep execution queue
        # (device idle, host blocked forever on the first readback).
        # Waiting on the metrics from `depth` steps ago caps in-flight
        # work while keeping the pipeline full — executions are
        # sequential per device, so step N-depth being done bounds the
        # queue at `depth` without ever draining it.
        depth = int(self.config.get("dispatch_queue_depth", 32))
        if depth > 0 and metrics:
            self._inflight.append(next(iter(metrics.values())))
            if len(self._inflight) > depth:
                jax.block_until_ready(self._inflight.popleft())
        self.steps += 1
        self._check_log_interval()
        self._check_eval_interval()
        self._check_save_interval()
        if self.steps >= self.config["train_max_steps"]:
            self.finish_train = True

    def _train_epoch(self):
        self.train_loader.set_epoch(self.epochs)
        n = 0
        for n, batch in enumerate(self.train_loader, 1):
            self._train_step(batch)
            if self.finish_train:
                break
        self.epochs += 1
        if n == 0:
            raise RuntimeError(
                "The training data loader produced 0 batches — dataset "
                "smaller than batch size, or all utterances were filtered."
            )
        logging.info(
            f"(Steps: {self.steps}) Finished {self.epochs} epoch training "
            f"({n} steps per epoch)."
        )

    def run(self):
        """Run training; config["profile_dir"] (or --profile-dir) captures a
        jax.profiler trace of steps [profile_start, profile_start+profile_steps)
        viewable in TensorBoard/XProf — a first-class flag the reference
        lacks (SURVEY.md section 5)."""
        self.tic = time.time()
        self._profile_dir = self.config.get("profile_dir")
        self._profile_start = self.config.get("profile_start_step", 10)
        self._profile_steps = self.config.get("profile_num_steps", 5)
        self._profiling = False
        try:
            while not self.finish_train:
                self._train_epoch()
        finally:
            if jax.process_index() == 0:
                self.save_checkpoint(
                    os.path.join(
                        self.outdir, f"checkpoint-{self.steps}steps.ckpt"
                    )
                )
        logging.info(f"Finished training ({self.steps} steps).")

    # ------------------------------------------------------------------
    def _maybe_profile(self):
        if not getattr(self, "_profile_dir", None):
            return
        import jax.profiler

        if not self._profiling and self.steps == self._profile_start:
            jax.profiler.start_trace(self._profile_dir)
            self._profiling = True
            logging.info(f"profiler trace started -> {self._profile_dir}")
        elif self._profiling and self.steps >= (
            self._profile_start + self._profile_steps
        ):
            jax.profiler.stop_trace()
            self._profiling = False
            logging.info("profiler trace stopped.")

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str):
        ckpt_lib.save_checkpoint(path, self.state)
        logging.info(f"Successfully saved checkpoint @ {self.steps} steps.")

    def load_checkpoint(self, path: str, load_only_params: bool = False):
        if load_only_params:
            state = ckpt_lib.load_params_only(path, jax.device_get(self.state))
        else:
            state = ckpt_lib.load_checkpoint(path, jax.device_get(self.state))
            self.steps = int(state.steps)
        self.state = replicate(self.mesh, state)

    # ------------------------------------------------------------------
    def _check_log_interval(self):
        interval = self.config.get("log_interval_steps", 100)
        if self.steps % interval == 0 and self.total_train_loss:
            # divide by the number of steps that actually contributed —
            # after warm-up ends or a resume lands mid-interval, fewer than
            # `interval` steps may have accumulated
            n_accum = max(getattr(self, "_accum_steps", interval), 1)
            for key in sorted(self.total_train_loss):
                self.total_train_loss[key] = (
                    float(self.total_train_loss[key]) / n_accum
                )
                logging.info(
                    f"(Steps: {self.steps}) {key} = "
                    f"{self.total_train_loss[key]:.4f}."
                )
            if self.writer:
                for k, v in self.total_train_loss.items():
                    self.writer.add_scalar(k, v, self.steps)
                self.writer.add_scalar(
                    "train/steps_per_sec",
                    n_accum / max(time.time() - getattr(self, "_log_tic",
                                                        self.tic), 1e-6),
                    self.steps,
                )
            self._log_tic = time.time()
            self.total_train_loss = defaultdict(float)
            self._accum_steps = 0

    def _check_save_interval(self):
        interval = self.config.get("save_interval_steps", 10000)
        if self.steps % interval == 0 and jax.process_index() == 0:
            self.save_checkpoint(
                os.path.join(self.outdir, f"checkpoint-{self.steps}steps.ckpt")
            )

    def _check_eval_interval(self):
        interval = self.config.get("eval_interval_steps", 1000)
        if self.steps % interval == 0 and self.eval_loader is not None:
            self._eval_epoch()

    # ------------------------------------------------------------------
    def _eval_epoch(self):
        logging.info(f"(Steps: {self.steps}) Start evaluation.")
        totals: Dict[str, float] = defaultdict(float)
        n_batches = 0
        _, use_adv, _ = self._flags()
        first_batch = None
        for n_batches, batch in enumerate(self.eval_loader, 1):
            if first_batch is None:
                first_batch = batch
            sharded = shard_batch(self.mesh, batch)
            metrics = self.eval_step(self.state, sharded, self.rng, use_adv)
            for k, v in metrics.items():
                totals[f"eval/{k}"] += v  # device-side; read back below
        for k in totals:
            totals[k] = float(totals[k]) / max(n_batches, 1)
            logging.info(f"(Steps: {self.steps}) {k} = {totals[k]:.4f}.")
        if self.writer:
            for k, v in totals.items():
                self.writer.add_scalar(k, v, self.steps)
        if first_batch is not None and jax.process_index() == 0:
            self._generate_and_save_intermediate_result(first_batch)

    def _generate_and_save_intermediate_result(self, batch):
        """Dump a few generated/reference wav pairs + plots (reference
        bin/train.py:513-578)."""
        try:
            from parallelwavegan_tpu.utils.io import write_wav

            state = jax.device_get(self.state)
            gvars = {"params": state.params_g, **state.extra_g}
            y_hat, _ = self.gen_forward(
                gvars, {k: np.asarray(v) for k, v in batch.items()},
                self.rng, True,
            )
            if self.config.get("generator_params", {}).get(
                "out_channels", 1
            ) > 1:
                y_hat = self.criterion["pqmf"].synthesis(y_hat)
            y_hat = np.asarray(y_hat)
            y = np.asarray(batch["y"])
            dirname = os.path.join(
                self.outdir, "predictions", f"{self.steps}steps"
            )
            os.makedirs(dirname, exist_ok=True)
            sr = self.config.get("sampling_rate", 22050)
            n_dump = self.config.get("num_save_intermediate_results", 4)
            for idx in range(min(n_dump, len(y))):
                write_wav(
                    os.path.join(dirname, f"{idx}_ref.wav"), y[idx, :, 0], sr
                )
                write_wav(
                    os.path.join(dirname, f"{idx}_gen.wav"),
                    y_hat[idx, :, 0], sr,
                )
                self._save_plot(
                    os.path.join(dirname, f"{idx}.png"),
                    y[idx, :, 0], y_hat[idx, :, 0],
                )
        except Exception as e:  # pragma: no cover
            logging.warning(f"intermediate dump failed: {e}")

    @staticmethod
    def _save_plot(path, y, y_hat):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(2, 1, figsize=(6, 4))
            axes[0].plot(y)
            axes[0].set_title("groundtruth speech")
            axes[1].plot(y_hat)
            axes[1].set_title("generated speech")
            fig.tight_layout()
            fig.savefig(path)
            plt.close(fig)
        except Exception:  # pragma: no cover
            pass
