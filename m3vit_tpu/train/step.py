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
    pass_sem: bool = False,
    semregu_weight: float = 0.01,
    subimage_weight: float = 0.01,
    pass_share_temp: bool = False,
    analysis_metrics: bool = False,
    compiler_options: Optional[Dict[str, object]] = None,
):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {'image': [B,H,W,3], <task>: [B,H,W,C_t], ...}
    cv_weight: --moe_noisy_gate_loss_weight (reference train_utils.py:440-449).
    pass_sem: feed batch['semseg'] to the backbone for sem-guided routing /
    regularizers (reference train_utils.py:424-426); the semregu and
    regu_subimage stats are then weighted into the total loss with
    semregu_weight / subimage_weight (--semregu_loss_weight /
    --subimageregu_weight, reference train_fastmoe.py:147,155 — the
    reference parses the weights and computes both losses but leaves the
    addition commented out; we apply them as intended).
    """

    def train_step(state, batch, rng, share_temp=None):
        # share_temp: traced scalar for the token variant's scheduled gumbel
        # temperature (reference train_fastmoe.py:628-632); passed per epoch
        # by the CLI without recompiling
        g_rng, d_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            kwargs = {}
            if pass_sem:
                kwargs["sem"] = batch["semseg"]
            if pass_share_temp and share_temp is not None:
                kwargs["share_temp"] = share_temp
            (pred, cv, stats), new_state = model.apply(
                variables,
                batch["image"],
                train=True,
                rngs={"gate_noise": g_rng, "dropout": d_rng},
                mutable=["batch_stats"],
                **kwargs,
            )
            losses = multi_task_loss(pred, batch, tasks, loss_fns, loss_weights)
            total = losses["total"] + cv_weight * cv
            if pass_sem and "semregu_loss" in stats:
                total = total + semregu_weight * stats["semregu_loss"]
                losses["semregu"] = stats["semregu_loss"]
            if pass_sem and "regu_subimage_loss" in stats:
                total = total + subimage_weight * stats["regu_subimage_loss"]
                losses["regu_subimage"] = stats["regu_subimage_loss"]
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
        if "dropped_slot_fraction" in stats:
            # mean over MoE blocks (and tasks in multi-gate): the guard for
            # the static-capacity deviation (the reference never drops;
            # ckpt/custom_moe_layer.py:263-265) — the CLI warns above
            # --moe_drop_warn_threshold
            metrics["moe_dropped_frac"] = stats["dropped_slot_fraction"] / \
                jnp.maximum(stats["moe_stat_count"], 1.0)
        # MoE analysis aggregates for the reference's analysis/* logging
        # namespace (utils/wandb_logger.py:371-399): entropy/top1 means,
        # per-expert load histogram + derived dead-expert ratio and load cv.
        # Off by default: extra outputs change the compiled program, and the
        # benchmark path must stay byte-identical for the compile cache.
        if analysis_metrics and "gate_token_count" in stats:
            n_tok = jnp.maximum(stats["gate_token_count"], 1.0)
            metrics["gate_entropy_mean"] = stats["gate_entropy_sum"] / n_tok
            metrics["top1_prob_mean"] = stats["top1_prob_sum"] / n_tok
            hist = stats["expert_load_hist"]
            metrics["expert_load_hist"] = hist
            metrics["dead_expert_ratio"] = (hist <= 0).mean().astype(
                jnp.float32)
            mean_l = jnp.maximum(hist.mean(), 1e-9)
            metrics["expert_load_cv"] = hist.std() / mean_l
        # env-gated high-frequency gate internals
        # (M3VIT_LOG_GATE_INTERNALS, reference noisy_gate_vmoe.py:209-244)
        if analysis_metrics and "gate_full_entropy_sum" in stats:
            n_tok = jnp.maximum(stats["gate_token_count"], 1.0)
            metrics["gate_full_entropy_mean"] = \
                stats["gate_full_entropy_sum"] / n_tok
            metrics["gate_pmax_mean"] = stats["gate_pmax_sum"] / n_tok
            metrics["topk_group_count_mean"] = \
                stats["topk_group_count_sum"] / n_tok
        return state, metrics

    # compiler_options: e.g. {"xla_tpu_enable_async_all_to_all": True} so
    # the EP dispatch a2a compiles to start/done pairs XLA can overlap with
    # expert GEMMs (scripts/dump_ep_schedule.py evidence; default TPU
    # compiles are fully synchronous).  None keeps the default-jit path
    # byte-identical for the bench compile cache.
    if compiler_options:
        return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                       compiler_options=compiler_options)
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_one_by_one_train_step(
    model,
    tasks: List[str],
    loss_fns: Dict[str, Callable],
    loss_weights: Dict[str, float],
    cv_weight: float = 0.01,
):
    """One-by-one per-task training (reference train_utils.py:370-421 with
    --one_by_one): each task gets its own forward/backward on the same batch
    (single_task routing pass), gradients accumulate across tasks, then ONE
    optimizer step.  Gradients are mathematically identical to the joint
    multi-gate loop; the win on TPU is peak memory — only one task's
    activations are ever live (~1/T of the fused step), since each per-task
    grad is its own XLA program.

    Returns (grad_fns, apply_fn):
      grad_fns[task](state, batch, rng) -> (grads, metrics)
      apply_fn(state, grads, batch_stats) -> state
    """
    def make_grad_fn(task):
        task_index = tasks.index(task)

        def grad_step(state, batch, rng):
            # fresh noise per task pass, like the reference's sequential
            # forwards advancing the global RNG (train_utils.py:374-379)
            g_rng, d_rng = jax.random.split(
                jax.random.fold_in(
                    jax.random.fold_in(rng, state.step), task_index
                )
            )

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                (pred, cv, _), new_state = model.apply(
                    variables, batch["image"], train=True,
                    single_task=task,
                    rngs={"gate_noise": g_rng, "dropout": d_rng},
                    mutable=["batch_stats"],
                )
                task_loss = loss_fns[task](pred[task], batch[task])
                total = loss_weights[task] * task_loss + cv_weight * cv
                return total, (task_loss, cv,
                               new_state.get("batch_stats", {}))

            (total, (task_loss, cv, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            return grads, {f"loss_{task}": task_loss, "loss_cv": cv,
                           "loss_total": total}, new_bs

        return jax.jit(grad_step)

    grad_fns = {t: make_grad_fn(t) for t in tasks}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def apply_fn(state, grads, new_bs):
        state = state.apply_gradients(grads=grads)
        if new_bs:
            state = state.replace(batch_stats=new_bs)
        return state

    return grad_fns, apply_fn


def make_eval_step(model, tasks: List[str], with_stats: bool = False):
    """Returns eval_step(state, batch) -> pred dict (full multi-task forward).

    with_stats=True returns (pred, moe_stats) so eval can enforce the
    no-drop guarantee (fastmoe's ragged dispatch never drops a token,
    reference ckpt/custom_moe_layer.py:263-265; our static capacity may —
    evaluate_online raises if dropped_slot_fraction > 0 at eval)."""

    def eval_step(state, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        pred, _, stats = model.apply(variables, batch["image"], train=False)
        if with_stats:
            return pred, stats
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
