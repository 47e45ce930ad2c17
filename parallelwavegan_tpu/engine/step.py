"""Jitted GAN train/eval steps (the SPMD analogue of the reference's
Trainer._train_step, /root/reference/parallel_wavegan/bin/train.py:193-339).

One compiled function performs the generator update then the discriminator
update. Warm-up gating (generator_train_start_steps /
discriminator_train_start_steps) selects between a handful of statically
compiled variants keyed on (train_g, use_adv, train_d) — thresholds are
crossed once per run, so at most three compilations happen, and each variant
is free of dead branches.

Parallelism: the trainer feeds a batch sharded over the mesh's "data" axis
with replicated params; XLA inserts the gradient all-reduce (psum over
ICI/DCN) automatically. Loss arithmetic matches the reference exactly,
including the 0.5/0.5 full-band/subband re-weighting and lambda_aux/
lambda_adv/lambda_feat_match application order.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from parallelwavegan_tpu.engine.state import GANTrainState


def fold_step_rng(rng, steps, axis):
    """Derive the per-step (and, under shard_map, per-device) rng stream.

    Folding in the device index decorrelates noise/dropout/random-window
    streams across data-parallel shards — the analogue of DDP's
    per-process RNG (each reference worker seeds its own torch/np RNG).
    Tested in tests/test_trainer.py::test_per_device_rng_decorrelation.
    """
    rng = jax.random.fold_in(rng, steps)
    if axis is not None:
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
    return rng


def make_generator_forward(
    config: Dict[str, Any], generator, per_device: bool = False
) -> Callable:
    """Adapter: (variables, batch, rng, deterministic) -> (y_hat, aux).

    per_device=True means the returned forward runs inside shard_map (one
    program per device, batch already local) — Pallas kernels are then safe
    on any device count.
    """
    gen_type = config.get("generator_type", "ParallelWaveGANGenerator")
    use_noise = gen_type in (
        "ParallelWaveGANGenerator",
    ) or config.get("use_noise_input", False)

    # fused Pallas WaveNet stack for the PWG training hot loop (custom VJP;
    # ops/pallas/wavenet_stack_train.py). Usable single-device under plain
    # jit (pallas_call is opaque to GSPMD, so sharded-batch jit runs keep
    # the XLA path) and on any device count under shard_map (per_device).
    # fused_wavenet_interpret=True forces the kernel in Pallas interpret
    # mode — CPU-mesh integration tests of the multi-chip path.
    fused_cfg = config.get("fused_wavenet", "auto")
    interpret_fused = bool(config.get("fused_wavenet_interpret", False))
    # interpret_fused only relaxes the backend check (CPU can run the kernel
    # in interpret mode); the per-device/device-count guard still applies —
    # pallas_call is opaque to GSPMD, so under plain jit on >1 device the
    # fused path would silently compute on unsharded views.
    use_fused = (
        gen_type == "ParallelWaveGANGenerator"
        and fused_cfg in (True, "auto", "true")
        and (interpret_fused or jax.default_backend() not in ("cpu",))
        and (per_device or jax.device_count() == 1)
    )
    if use_fused:
        from parallelwavegan_tpu.ops.pallas.pwg_infer import (
            pwg_fused_forward,
            supports_fused_inference,
        )

        use_fused = supports_fused_inference(generator)
    if use_fused:
        # 0/unset = auto (even chunks near 6400; see pwg_fused_forward)
        fused_chunk = int(config.get("fused_wavenet_chunk", 0)) or None

        def forward(variables, batch, rng, deterministic):
            y_ = pwg_fused_forward(
                generator, variables, batch["z"], batch["c"],
                trainable=True, chunk=fused_chunk,
                interpret=interpret_fused,
            )
            return y_, {}

        return forward

    def forward(variables, batch, rng, deterministic):
        r_drop, r_noise = jax.random.split(rng)
        rngs = {"dropout": r_drop, "noise": r_noise}
        aux: Dict[str, Any] = {}
        if gen_type == "VQVAE":
            x_in = batch.get("x_vq", batch["y"])
            y_, z_e, z_q = generator.apply(
                variables, x_in, batch.get("l"), batch.get("g"),
                deterministic, rngs=rngs,
            )
            aux["z_e"], aux["z_q"] = z_e, z_q
        elif "Duration" in gen_type:
            y_, ds_out = generator.apply(
                variables, batch["c"], batch["ds"], deterministic, rngs=rngs
            )
            aux["ds_out"] = ds_out
        elif gen_type == "UHiFiGANGenerator":
            y_ = generator.apply(
                variables, batch["c"], batch.get("f0"),
                batch.get("excitation"), deterministic, rngs=rngs,
            )
        elif "StyleMelGAN" in gen_type:
            y_ = generator.apply(
                variables, batch["c"], None, deterministic, rngs=rngs
            )
        elif gen_type == "DiscreteSymbolF0Generator":
            y_ = generator.apply(
                variables, batch["c"], batch.get("f0"), deterministic,
                rngs=rngs,
            )
        elif use_noise:
            y_ = generator.apply(
                variables, batch["z"], batch["c"], deterministic, rngs=rngs
            )
        else:
            y_ = generator.apply(
                variables, batch["c"], deterministic, rngs=rngs
            )
        return y_, aux

    return forward


def make_discriminator_forward(config: Dict[str, Any], discriminator):
    """Adapter handling spectral-norm state + random-window rng.

    Returns (variables, x, rng, train) -> (outputs, new_extra).
    """
    def forward(params_d, extra_d, x, rng, train):
        variables = {"params": params_d, **extra_d}
        rngs = {"window": rng}
        if train and "spectral" in extra_d:
            outs, updated = discriminator.apply(
                variables, x, False, rngs=rngs, mutable=["spectral"]
            )
            new_extra = dict(extra_d)
            new_extra["spectral"] = updated["spectral"]
            return outs, new_extra
        outs = discriminator.apply(variables, x, not train, rngs=rngs)
        return outs, extra_d

    return forward


def build_steps(
    config: Dict[str, Any],
    generator,
    discriminator,
    criterion: Dict[str, Any],
    opt_g,
    opt_d,
    mesh=None,
):
    """Return (train_step_factory, eval_step).

    train_step_factory(train_g, use_adv, train_d) -> jitted step
      step(state, batch, rng) -> (new_state, metrics)
    eval_step(state, batch, rng) -> metrics   (includes adv metrics)

    When `mesh` spans >1 device, train steps are built with
    jax.shard_map over the mesh's leading axis: params replicated, batch
    sharded on dim 0, explicit pmean of gradients and metrics — the direct
    analogue of the reference's DDP all-reduce (bin/train.py:1558-1567).
    This also keeps Pallas kernels usable multi-chip (per-device programs),
    where GSPMD would exclude them. Per-shard rngs are decorrelated by
    folding in the axis index, matching DDP's per-process RNG streams.
    eval_step stays on the plain-jit GSPMD path, which tolerates
    non-divisible (replicated) eval batches.
    """
    axis = None
    if mesh is not None and mesh.devices.size > 1:
        bs = config.get("batch_size")
        # shard_map needs equal shards and a known global batch: an absent
        # batch_size is treated as non-divisible rather than assumed OK.
        if bs is None or bs % mesh.devices.size != 0:
            import logging

            logging.warning(
                "batch_size %s not divisible by mesh size %d; using the "
                "GSPMD train path (Pallas kernels disabled multi-chip)",
                bs, mesh.devices.size,
            )
        else:
            axis = mesh.axis_names[0]
    gen_forward_raw = make_generator_forward(
        config, generator, per_device=axis is not None
    )
    dis_forward_raw = make_discriminator_forward(config, discriminator)
    out_ch = config.get("generator_params", {}).get("out_channels", 1)
    gen_type = config.get("generator_type", "ParallelWaveGANGenerator")
    is_vq = gen_type == "VQVAE"
    lambda_aux = config.get("lambda_aux", 1.0)
    lambda_adv = config.get("lambda_adv", 4.0)
    lambda_fm = config.get("lambda_feat_match", 2.0)
    lambda_commit = config.get("lambda_commit", 0.25)
    dis_type = config.get(
        "discriminator_type", "ParallelWaveGANDiscriminator"
    )
    # Fused real|fake discriminator pass: one forward over
    # concat([real, fake]) instead of two — every module in the
    # PWG/MelGAN/HiFiGAN discriminators is batch-pointwise (convs,
    # weight/spectral norm; no batch stats), so the split outputs are
    # IDENTICAL to two passes (tested in test_trainer.py). Defaults are
    # set by A/B measurement on the v5e chip (BENCH_FUSE_RF, see
    # docs/BENCHMARKS.md "training throughput"):
    #   - MSMPD (HiFiGAN): fusion measured SLOWER (9.77 vs 10.31 steps/s
    #     mixed-precision) — the doubled-batch period reshapes cost more
    #     than the halved op count saves -> default OFF;
    #   - PWG: fused measured 14.97 steps/s -> default ON;
    #   - StyleMelGAN D draws random windows per forward (reference
    #     style_melgan.py:324-337 gives real and fake independent
    #     windows), so fusing would change training semantics -> OFF.
    # Note the spectral-norm power iteration advances once instead of
    # twice per step under fusion (it depends only on the weights; the
    # trajectory difference is below train-noise).
    fuse_rf = bool(
        config.get(
            "fuse_real_fake_discriminator",
            "StyleMelGAN" not in dis_type
            and "HiFiGANMultiScaleMultiPeriod" not in dis_type,
        )
    )

    # mixed precision (config `mixed_precision: true`): master params stay
    # f32 (optimizer/gradient accumulation precision), network forwards run
    # in bf16 (MXU-native), losses reduce in f32. The cast-in is
    # differentiable so grads come back f32. The reference trains pure-f32
    # on GPU; this is the TPU-idiomatic equivalent knob.
    mixed = bool(config.get("mixed_precision", False))

    def _half(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    def _full(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
            tree,
        )

    def _mixed_gen(raw):
        if not mixed:
            return raw

        def gen_forward(gvars, batch, rng, deterministic):
            y_, aux = raw(_half(gvars), _half(batch), rng, deterministic)
            return _full(y_), _full(aux)

        return gen_forward

    gen_forward = _mixed_gen(gen_forward_raw)
    # eval runs under plain jit (GSPMD), where the per-device Pallas path
    # is not valid on >1 device — build it a GSPMD-safe forward
    gen_forward_eval = (
        gen_forward if axis is None
        else _mixed_gen(make_generator_forward(config, generator))
    )

    if mixed:
        def dis_forward(params_d, extra_d, x, rng, train):
            outs, new_extra = dis_forward_raw(
                _half(params_d), _half(extra_d),
                x.astype(jnp.bfloat16), rng, train,
            )
            # carried state (spectral-norm power iteration) back to f32
            return _full(outs), _full(new_extra)
    else:
        dis_forward = dis_forward_raw

    def prepare_batch(batch):
        """Host-side-free prep: VQ subband input."""
        batch = dict(batch)
        if is_vq and config["generator_params"].get("in_channels", 1) > 1:
            batch["x_vq"] = criterion["pqmf"].analysis(batch["y"])
        return batch

    def make_gen_losses(gen_fwd):
      def gen_losses(params_g, extra_g, params_d, extra_d, batch, rng,
                     use_adv, deterministic):
        metrics = {}
        r_gen, r_d1, r_d2 = jax.random.split(rng, 3)
        gvars = {"params": params_g, **extra_g}
        y = batch["y"]  # (B, T, 1)
        y_, aux = gen_fwd(gvars, batch, r_gen, deterministic)
        gen_loss = 0.0

        if is_vq:
            z_e, z_q = aux["z_e"], aux["z_q"]
            quant = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)
            commit = jnp.mean((z_e - jax.lax.stop_gradient(z_q)) ** 2)
            metrics["quantization_loss"] = quant
            metrics["commitment_loss"] = commit
            gen_loss += quant + lambda_commit * commit
        if "ds_out" in aux:
            d_loss = criterion["duration"](aux["ds_out"], batch["ds"])
            metrics["duration_loss"] = d_loss
            gen_loss += d_loss

        y_mb_ = None
        if out_ch > 1:
            y_mb_ = y_  # (B, T//S, S)
            y_ = criterion["pqmf"].synthesis(y_mb_)

        y_sq = y[..., 0]
        y_hat_sq = y_[..., 0]
        if "stft" in criterion:
            sc_loss, mag_loss = criterion["stft"](y_hat_sq, y_sq)
            metrics["spectral_convergence_loss"] = sc_loss
            metrics["log_stft_magnitude_loss"] = mag_loss
            gen_loss += sc_loss + mag_loss
        if "sub_stft" in criterion:
            gen_loss *= 0.5  # balance full-band vs subband
            y_mb = criterion["pqmf"].analysis(y)
            sub_sc, sub_mag = criterion["sub_stft"](
                jnp.transpose(y_mb_, (0, 2, 1)), jnp.transpose(y_mb, (0, 2, 1))
            )
            metrics["sub_spectral_convergence_loss"] = sub_sc
            metrics["sub_log_stft_magnitude_loss"] = sub_mag
            gen_loss += 0.5 * (sub_sc + sub_mag)
        if "mel" in criterion:
            mel_loss = criterion["mel"](y_hat_sq, y_sq)
            metrics["mel_loss"] = mel_loss
            gen_loss += mel_loss

        gen_loss *= lambda_aux

        if use_adv:
            # discriminator in eval mode during the generator update (the
            # spectral-norm u update happens in the discriminator update)
            if fuse_rf and "feat_match" in criterion:
                # one fused fake|real pass (see fuse_rf note above); grads
                # w.r.t. params_d are never taken here and feat_match
                # stop-grads the real features internally
                nb = y_.shape[0]
                p_all, _ = dis_forward(
                    params_d, extra_d,
                    jnp.concatenate([y_, y], axis=0), r_d1, train=False,
                )
                p_ = jax.tree_util.tree_map(lambda t: t[:nb], p_all)
                p = jax.tree_util.tree_map(lambda t: t[nb:], p_all)
            else:
                p_, _ = dis_forward(params_d, extra_d, y_, r_d1, train=False)
                p = None
            adv_loss = criterion["gen_adv"](p_)
            metrics["adversarial_loss"] = adv_loss
            if "feat_match" in criterion:
                if p is None:
                    p, _ = dis_forward(
                        jax.lax.stop_gradient(params_d), extra_d, y, r_d2,
                        train=False,
                    )
                fm_loss = criterion["feat_match"](p_, p)
                metrics["feature_matching_loss"] = fm_loss
                adv_loss = adv_loss + lambda_fm * fm_loss
            gen_loss = gen_loss + lambda_adv * adv_loss

        metrics["generator_loss"] = gen_loss
        return gen_loss, (metrics, y_, aux)

      return gen_losses

    gen_losses = make_gen_losses(gen_forward)
    gen_losses_eval = (
        gen_losses if axis is None else make_gen_losses(gen_forward_eval)
    )

    def dis_losses(params_d, extra_d, y, y_hat, rng, train):
        if fuse_rf:
            # fused real|fake pass (see fuse_rf note above)
            nb = y.shape[0]
            both = jnp.concatenate(
                [y, jax.lax.stop_gradient(y_hat)], axis=0
            )
            p_all, extra2 = dis_forward(params_d, extra_d, both, rng, train)
            p = jax.tree_util.tree_map(lambda t: t[:nb], p_all)
            p_ = jax.tree_util.tree_map(lambda t: t[nb:], p_all)
        else:
            r1, r2 = jax.random.split(rng)
            p, extra1 = dis_forward(params_d, extra_d, y, r1, train)
            p_, extra2 = dis_forward(
                params_d, extra1, jax.lax.stop_gradient(y_hat), r2, train
            )
        real_loss, fake_loss = criterion["dis_adv"](p_, p)
        dis_loss = real_loss + fake_loss
        metrics = {
            "real_loss": real_loss,
            "fake_loss": fake_loss,
            "discriminator_loss": dis_loss,
        }
        return dis_loss, (metrics, extra2)

    recompute = config.get("update_prediction_after_generator_update", True)
    ema_decay = float(config.get("generator_ema_decay", 0.0) or 0.0)
    # VQ dead-code restart (config vq_dead_code_restart: true): embeddings
    # unused by the current batch are re-seeded with (pmean'd) random
    # encoder outputs. The reference's tiny U(+-1/K) codebook init puts
    # every embedding far inside the encoder-output cloud, so 1-2 codes
    # win every assignment at init and the rest never receive gradient
    # (measured total collapse on the rich corpus, docs/VALIDATION.md);
    # random restarts are the standard mitigation (Jukebox/VQGAN-style)
    # the reference lacks.
    vq_restart = is_vq and bool(config.get("vq_dead_code_restart", False))
    # restart probability per dead code per step. 1.0 (default) re-seeds
    # every batch-unused code immediately — A/B MEASURED on the rich
    # corpus: always-restart reaches copy-synthesis MCD 26.8 while
    # p=0.1 ("let dead codes persist so data can claim them") re-collapses
    # to MCD 79 — constant re-seeding keeps the whole codebook inside the
    # moving encoder cloud, which matters more than per-code stability
    # (docs/VALIDATION.md VQ-VAE run).
    vq_restart_prob = float(config.get("vq_restart_prob", 1.0))

    def _vq_dead_restart(params_g, z_e, rng, rng_shared):
        emb = params_g["codebook"]["embedding"]  # (K, D)
        flat = jax.lax.stop_gradient(z_e).reshape(-1, emb.shape[-1])
        dist = (
            jnp.sum(flat**2, -1, keepdims=True)
            - 2.0 * flat @ emb.T
            + jnp.sum(emb**2, -1)[None, :]
        )
        used = jnp.zeros((emb.shape[0],), jnp.float32).at[
            jnp.argmin(dist, axis=-1)
        ].add(1.0)
        if axis is not None:
            used = jax.lax.psum(used, axis)
        repl = flat[
            jax.random.randint(rng, (emb.shape[0],), 0, flat.shape[0])
        ]
        # gate from the SHARED (pre-device-fold) stream so the restart
        # probability is exactly vq_restart_prob regardless of mesh size,
        # and every shard makes the same decision
        gate = jax.random.uniform(
            rng_shared, used.shape
        ) < vq_restart_prob
        if axis is not None:
            # keep params replicated: every shard must write the same
            # restart vectors (the pmean of per-shard random encoder
            # outputs is itself a valid latent-cloud point)
            repl = jax.lax.pmean(repl, axis)
        new_emb = jnp.where(
            ((used == 0.0) & gate)[:, None], repl.astype(emb.dtype), emb
        )
        new_params = dict(params_g)
        new_params["codebook"] = dict(params_g["codebook"])
        new_params["codebook"]["embedding"] = new_emb
        return new_params, jnp.sum(used > 0.0)

    @functools.lru_cache(maxsize=8)
    def train_step_factory(train_g: bool, use_adv: bool, train_d: bool):
        def step(state: GANTrainState, batch, rng) -> Tuple[GANTrainState, Dict]:
            batch = prepare_batch(batch)
            rng_shared = jax.random.fold_in(rng, state.steps)
            rng = fold_step_rng(rng, state.steps, axis)
            r_g, r_dg, r_d, r_vq = jax.random.split(rng, 4)
            r_vq_shared = jax.random.fold_in(rng_shared, 0x5bdead)
            metrics: Dict[str, jnp.ndarray] = {}
            params_g, opt_g_state = state.params_g, state.opt_g
            y_hat = None

            if train_g:
                (gen_loss, (m, y_hat, aux_g)), grads = jax.value_and_grad(
                    gen_losses, has_aux=True
                )(
                    state.params_g, state.extra_g, state.params_d,
                    state.extra_d, batch, r_g, use_adv, False,
                )
                metrics.update(m)
                if axis is not None:
                    grads = jax.lax.pmean(grads, axis)
                updates, opt_g_state = opt_g.update(
                    grads, state.opt_g, state.params_g
                )
                params_g = jax.tree_util.tree_map(
                    lambda p, u: p + u, state.params_g, updates
                )
                if vq_restart:
                    params_g, codes_used = _vq_dead_restart(
                        params_g, aux_g["z_e"], r_vq, r_vq_shared
                    )
                    metrics["vq_codes_used"] = codes_used.astype(
                        jnp.float32
                    )

            ema_g = state.ema_g
            if train_g and ema_decay > 0.0 and state.ema_g is not None:
                # EMA depends only on the (pmean-replicated) params, so it
                # stays replicated under shard_map like the params do
                ema_g = jax.tree_util.tree_map(
                    lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                    state.ema_g, params_g,
                )

            params_d, opt_d_state, extra_d = (
                state.params_d, state.opt_d, state.extra_d
            )
            if train_d:
                if recompute or not train_g or y_hat is None:
                    gvars = {"params": params_g, **state.extra_g}
                    y_hat_d, _ = gen_forward(gvars, batch, r_dg, False)
                    if out_ch > 1:
                        y_hat_d = criterion["pqmf"].synthesis(y_hat_d)
                else:
                    y_hat_d = y_hat
                (dis_loss, (m, extra_d)), grads_d = jax.value_and_grad(
                    dis_losses, has_aux=True
                )(
                    state.params_d, state.extra_d, batch["y"],
                    jax.lax.stop_gradient(y_hat_d), r_d, True,
                )
                metrics.update(m)
                if axis is not None:
                    grads_d = jax.lax.pmean(grads_d, axis)
                updates_d, opt_d_state = opt_d.update(
                    grads_d, state.opt_d, state.params_d
                )
                params_d = jax.tree_util.tree_map(
                    lambda p, u: p + u, state.params_d, updates_d
                )

            new_state = state.replace(
                steps=state.steps + 1,
                params_g=params_g,
                opt_g=opt_g_state,
                params_d=params_d,
                extra_d=extra_d,
                opt_d=opt_d_state,
                ema_g=ema_g,
            )
            if axis is not None:
                metrics = jax.lax.pmean(metrics, axis)
            return new_state, metrics

        if axis is None:
            return jax.jit(step, donate_argnums=(0,))
        from jax.sharding import PartitionSpec as P

        # INVARIANT (check_vma=False + out_specs=P() assert replication):
        # every component of new_state must be data-independent given the
        # pmean'd grads — params/opt states update from all-reduced grads,
        # and the only mutable collection threaded through (extra_d's
        # spectral-norm power-iteration u) depends solely on params, never
        # on the local batch or per-shard rng. Any future mutable
        # collection that is batch- or rng-dependent (e.g. batch stats)
        # must itself be pmean'd before being stored, or it will silently
        # diverge per shard.
        smapped = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(smapped, donate_argnums=(0,))

    def eval_step(state: GANTrainState, batch, rng, use_adv: bool = True):
        batch = prepare_batch(batch)
        rng = jax.random.fold_in(rng, state.steps)
        r_g, r_d = jax.random.split(rng)
        _, (metrics, y_hat, _aux) = gen_losses_eval(
            state.params_g, state.extra_g, state.params_d, state.extra_d,
            batch, r_g, use_adv, True,
        )
        if use_adv:
            _, (m_d, _) = dis_losses(
                state.params_d, state.extra_d, batch["y"], y_hat, r_d, False
            )
            metrics.update(m_d)
        return metrics

    return train_step_factory, jax.jit(eval_step, static_argnums=(3,))
