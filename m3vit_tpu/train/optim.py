"""Optimizers and LR schedules (reference: utils/common_config.py:858-924).

torch-SGD semantics preserved: coupled weight decay (grad += wd * param before
the momentum buffer), single param group, decay applied to every parameter.
LR is adjusted once per epoch: poly  lr*(1-epoch/epochs)^0.9  or step decay.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import optax


def poly_lr(base_lr: float, epochs: int, steps_per_epoch: int):
    """Per-epoch poly schedule, constant within an epoch
    (reference adjust_learning_rate, common_config.py:914-916)."""

    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch)
        frac = 1.0 - epoch.astype(jnp.float32) / float(epochs)
        return base_lr * jnp.power(jnp.maximum(frac, 0.0), 0.9)

    return schedule


def step_lr(base_lr: float, steps_per_epoch: int, decay_epochs, decay_rate: float):
    decay_epochs = jnp.asarray(list(decay_epochs), jnp.float32)

    def schedule(step):
        epoch = (step // steps_per_epoch).astype(jnp.float32)
        n = (epoch[None] > decay_epochs).sum() if epoch.ndim else (
            epoch > decay_epochs
        ).sum()
        return base_lr * decay_rate ** n.astype(jnp.float32)

    return schedule


def build_schedule(p, steps_per_epoch: int):
    kw = p.get("optimizer_kwargs") or {}
    base_lr = float(kw.get("lr", 1e-3))
    if p.get("scheduler", "poly") == "poly":
        return poly_lr(base_lr, int(p["epochs"]), steps_per_epoch)
    if p["scheduler"] == "step":
        skw = p.get("scheduler_kwargs") or {}
        return step_lr(
            base_lr, steps_per_epoch,
            skw.get("lr_decay_epochs", []), float(skw.get("lr_decay_rate", 0.1)),
        )
    raise ValueError(p["scheduler"])


def build_optimizer(p, steps_per_epoch: int) -> optax.GradientTransformation:
    kw = dict(p.get("optimizer_kwargs") or {})
    accum = int(p.get("accumulation_steps", 1))
    # the LR schedule sees optimizer steps; with accumulation each optimizer
    # step consumes `accum` micro-batches (reference --accumulation_steps,
    # train_fastmoe.py:105, train_utils.py:457-464)
    schedule = build_schedule(p, max(steps_per_epoch // max(accum, 1), 1))
    name = p.get("optimizer", "sgd")
    wd = float(kw.get("weight_decay", 0.0))

    if name == "sgd":
        parts = []
        if wd > 0:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(
            optax.sgd(
                schedule,
                momentum=float(kw.get("momentum", 0.0)) or None,
                nesterov=bool(kw.get("nesterov", False)),
            )
        )
        tx = optax.chain(*parts)
    elif name == "adam":
        tx = optax.adam(schedule)
    elif name == "adamw":
        tx = optax.adamw(schedule, weight_decay=wd)
    else:
        raise ValueError(f"Invalid optimizer {name}")
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def share_pred_temperature(p, epoch: int) -> Optional[float]:
    """Shareability-predictor Gumbel temperature for this epoch, or None when
    no schedule is configured (reference compute_share_pred_temperature,
    common_config.py:927-957; applied per epoch in train_fastmoe.py:628-632).

    Keys: share_pred_temp_schedule (none|linear|cosine),
    share_pred_temp_start/end, share_pred_temp_warmup_epochs.
    """
    import math

    schedule = str(p.get("share_pred_temp_schedule", "none")).lower()
    if schedule in ("none", "off", "false", ""):
        return None
    t_start = float(p.get("share_pred_temp_start", 1.0))
    t_end = float(p.get("share_pred_temp_end", 1.0))
    warmup = int(p.get("share_pred_temp_warmup_epochs", 0))
    total = int(p.get("epochs", 1))
    if total <= 1 or epoch < warmup:
        return t_start
    denom = max(1, total - warmup - 1)
    progress = min(1.0, max(0.0, float(epoch - warmup) / float(denom)))
    if schedule == "linear":
        return t_start + (t_end - t_start) * progress
    if schedule == "cosine":
        return t_end + 0.5 * (t_start - t_end) * (
            1.0 + math.cos(math.pi * progress)
        )
    raise ValueError(f"Invalid share_pred_temp_schedule: {schedule}")
