"""Jitted train / eval steps.

One fused XLA computation per optimizer step: forward over all tasks (per-task
router passes in multi-gate mode), weighted multi-task loss + cv_loss,
backward, coupled-WD SGD update.  The reference spreads this over
train_utils.py:346-527 with manual allreduce_params; under pjit the gradient
collectives are implied by the shardings.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from m3vit_tpu.losses.schemes import multi_task_loss


def make_train_step(
    model,
    tasks: List[str],
    loss_fns: Dict[str, Callable],
    loss_weights: Dict[str, float],
    cv_weight: float = 0.01,
    donate: bool = True,
):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {'image': [B,H,W,3], <task>: [B,H,W,C_t], ...}
    cv_weight: --moe_noisy_gate_loss_weight (reference train_utils.py:440-449).
    """

    def train_step(state, batch, rng):
        g_rng, d_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            (pred, cv, stats), new_state = model.apply(
                variables,
                batch["image"],
                train=True,
                rngs={"gate_noise": g_rng, "dropout": d_rng},
                mutable=["batch_stats"],
            )
            losses = multi_task_loss(pred, batch, tasks, loss_fns, loss_weights)
            total = losses["total"] + cv_weight * cv
            return total, (losses, cv, new_state.get("batch_stats", {}), stats)

        (total, (losses, cv, new_bs, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if new_bs:
            state = state.replace(batch_stats=new_bs)
        metrics = {f"loss_{k}": v for k, v in losses.items()}
        metrics["loss_cv"] = cv
        metrics["loss_total_with_cv"] = total
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, tasks: List[str]):
    """Returns eval_step(state, batch) -> pred dict (full multi-task forward)."""

    def eval_step(state, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        pred, _, _ = model.apply(variables, batch["image"], train=False)
        return pred

    return jax.jit(eval_step)


def make_single_task_eval_step(model, task: str):
    """Sparse single-task inference: only `task`'s router pathway + decoder
    (reference zero-overhead task switching, README.md:8-20)."""

    def eval_step(state, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        pred, _, _ = model.apply(
            variables, batch["image"], train=False, single_task=task
        )
        return pred

    return jax.jit(eval_step)
