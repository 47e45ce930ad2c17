"""Optimizer/scheduler factories mapping reference YAML names to optax.

The reference resolves torch classes by name
(/root/reference/parallel_wavegan/bin/train.py:1518-1557, optimizers/radam.py);
here the same names resolve to optax transforms, with torch scheduler
semantics re-expressed as optax schedules stepped per train step (the
reference calls scheduler.step() every step).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import optax


def build_schedule(
    scheduler_type: str,
    scheduler_params: Optional[Dict[str, Any]],
    base_lr: float,
):
    """torch scheduler name -> optax schedule (per-step)."""
    p = dict(scheduler_params or {})
    if scheduler_type == "StepLR":
        return optax.exponential_decay(
            init_value=base_lr,
            transition_steps=p.get("step_size", 1),
            decay_rate=p.get("gamma", 0.1),
            staircase=True,
        )
    if scheduler_type == "MultiStepLR":
        gamma = p.get("gamma", 0.1)
        milestones = p.get("milestones", [])
        return optax.piecewise_constant_schedule(
            init_value=base_lr,
            boundaries_and_scales={int(m): gamma for m in milestones},
        )
    if scheduler_type == "ExponentialLR":
        return optax.exponential_decay(
            init_value=base_lr, transition_steps=1,
            decay_rate=p.get("gamma", 0.99), staircase=True,
        )
    if scheduler_type == "CosineAnnealingLR":
        return optax.cosine_decay_schedule(
            init_value=base_lr, decay_steps=p.get("T_max", 1),
            alpha=p.get("eta_min", 0.0) / max(base_lr, 1e-12),
        )
    if scheduler_type in (None, "None", "Constant"):
        return base_lr
    raise ValueError(f"unsupported scheduler: {scheduler_type}")


def build_optimizer(
    optimizer_type: str = "RAdam",
    optimizer_params: Optional[Dict[str, Any]] = None,
    scheduler_type: str = "StepLR",
    scheduler_params: Optional[Dict[str, Any]] = None,
    grad_norm: float = -1,
) -> optax.GradientTransformation:
    """Build clip -> optimizer -> lr-schedule chain from reference config keys."""
    p = dict(optimizer_params or {})
    lr = p.pop("lr", 1e-3)
    betas = p.pop("betas", None)
    b1, b2 = (betas if betas is not None else (0.9, 0.999))
    eps = p.pop("eps", 1e-8)
    weight_decay = p.pop("weight_decay", 0.0)
    schedule = build_schedule(scheduler_type, scheduler_params, lr)

    if optimizer_type == "RAdam":
        opt = optax.radam(schedule, b1=b1, b2=b2, eps=eps)
        if weight_decay:
            opt = optax.chain(
                optax.add_decayed_weights(weight_decay), opt
            )
    elif optimizer_type == "Adam":
        if weight_decay:
            opt = optax.adamw(
                schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
            )
        else:
            opt = optax.adam(schedule, b1=b1, b2=b2, eps=eps)
    elif optimizer_type == "AdamW":
        opt = optax.adamw(
            schedule, b1=b1, b2=b2, eps=eps,
            weight_decay=weight_decay or 0.01,
        )
    elif optimizer_type == "SGD":
        opt = optax.sgd(schedule, momentum=p.pop("momentum", 0.0))
    else:
        raise ValueError(f"unsupported optimizer: {optimizer_type}")

    if grad_norm is not None and grad_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(float(grad_norm)), opt)
    return opt
