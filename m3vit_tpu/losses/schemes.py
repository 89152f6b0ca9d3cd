"""Loss schemes: weighted multi-task sums (reference: losses/loss_schemes.py).

These are pure functions over dicts of predictions/targets; the per-task loss
fns come from losses.functions.loss_fn_for_task.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax.numpy as jnp

from m3vit_tpu.losses.functions import loss_fn_for_task


def build_loss_fns(p) -> Dict[str, Callable]:
    return {t.name: loss_fn_for_task(t.name, p) for t in p["TASKS"]}


def single_task_loss(
    pred: Dict[str, jnp.ndarray],
    gt: Dict[str, jnp.ndarray],
    task: str,
    loss_fns: Dict[str, Callable],
) -> Dict[str, jnp.ndarray]:
    """reference: loss_schemes.py:10-20"""
    out = {task: loss_fns[task](pred[task], gt[task])}
    out["total"] = out[task]
    return out


def multi_task_loss(
    pred: Dict[str, jnp.ndarray],
    gt: Dict[str, jnp.ndarray],
    tasks: List[str],
    loss_fns: Dict[str, Callable],
    loss_weights: Dict[str, float],
    single_task: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """Weighted sum over tasks; human_parts NaN guarded; optional per-task mode.

    reference: loss_schemes.py:43-115. The TAM branches add extra weighted
    terms for 'tam_level{0,1,2}_{task}' predictions when present.
    """
    if single_task is not None:
        out = {single_task: loss_fns[single_task](pred[single_task], gt[single_task])}
        out["total"] = loss_weights[single_task] * out[single_task]
        return out

    out: Dict[str, jnp.ndarray] = {}
    total = jnp.asarray(0.0, jnp.float32)

    # papnet_new multi-level weight/4: the reference divides EVERY task
    # weight by 4 at init when multi_level is on (loss_schemes.py:32-35),
    # so the scale applies to every term below — tam branches included.
    lvl_scale = 0.25 if f"level1_{tasks[0]}" in pred else 1.0

    # plain tam_<task> branch (reference: loss_schemes.py:44-61, JTRL path)
    if f"tam_{tasks[0]}" in pred:
        for task in tasks:
            l = loss_fns[task](pred[f"tam_{task}"], gt[task])
            l = jnp.nan_to_num(l, nan=0.0)
            out[f"tam_{task}"] = l
            total = total + lvl_scale * loss_weights[task] * l

    # TAM deep-supervision branches (reference: loss_schemes.py:63-93)
    for level in (0, 1, 2):
        key0 = f"tam_level{level}_{tasks[0]}"
        if key0 in pred:
            for task in tasks:
                l = loss_fns[task](pred[f"tam_level{level}_{task}"], gt[task])
                l = jnp.nan_to_num(l, nan=0.0)
                out[f"tam_level{level}_{task}"] = l
                total = total + lvl_scale * loss_weights[task] * l

    # papnet_new multi-level deep supervision (level{1,2,3}_<task> from
    # PAPNetViT multi_level=True).  The reference's MultiTaskLoss never
    # actually consumes the level keys — papnet_new is dead code there;
    # this is the reconstructed intent, gated on the keys' presence so
    # plain models are untouched.
    if f"level1_{tasks[0]}" in pred:
        for level in (1, 2, 3):
            for task in tasks:
                l = loss_fns[task](pred[f"level{level}_{task}"], gt[task])
                l = jnp.nan_to_num(l, nan=0.0)
                out[f"level{level}_{task}"] = l
                total = total + lvl_scale * loss_weights[task] * l

    for task in tasks:
        l = loss_fns[task](pred[task], gt[task])
        if task == "human_parts":
            # images without any person produce an all-ignored human_parts
            # target; reference nan_to_nums that loss (loss_schemes.py:108-110)
            l = jnp.nan_to_num(l, nan=0.0)
        out[task] = l
        # lvl_scale: the reference's multi_level weight/4 applies to the
        # final outputs too (loss_schemes.py:32-35)
        total = total + lvl_scale * loss_weights[task] * l

    out["total"] = total
    return out


def _resize_to(pred, gt):
    import jax

    b, h, w, c = pred.shape
    th, tw = gt.shape[1], gt.shape[2]
    if (h, w) == (th, tw):
        return pred
    return jax.image.resize(pred, (b, th, tw, c), "bilinear")


def padnet_loss(
    pred: Dict[str, jnp.ndarray],
    gt: Dict[str, jnp.ndarray],
    tasks: List[str],
    auxilary_tasks: List[str],
    loss_fns: Dict[str, Callable],
    loss_weights: Dict[str, float],
) -> Dict[str, jnp.ndarray]:
    """Deep-supervised initial predictions + final outputs
    (reference loss_schemes.py:118-163)."""
    out: Dict[str, jnp.ndarray] = {}
    total = jnp.asarray(0.0, jnp.float32)
    for task in auxilary_tasks:
        l = loss_fns[task](_resize_to(pred[f"initial_{task}"], gt[task]),
                           gt[task])
        out[f"deepsup_{task}"] = l
        total = total + loss_weights[task] * l
    for task in tasks:
        l = loss_fns[task](pred[task], gt[task])
        out[task] = l
        total = total + loss_weights[task] * l
    out["total"] = total
    return out


def mtinet_loss(
    pred: Dict,
    gt: Dict[str, jnp.ndarray],
    tasks: List[str],
    auxilary_tasks: List[str],
    loss_fns: Dict[str, Callable],
    loss_weights: Dict[str, float],
) -> Dict[str, jnp.ndarray]:
    """4-scale deep supervision + final outputs
    (reference loss_schemes.py:215-247)."""
    out: Dict[str, jnp.ndarray] = {}
    total = jnp.asarray(0.0, jnp.float32)
    for scale in range(4):
        ps = pred["deep_supervision"][f"scale_{scale}"]
        for task in auxilary_tasks:
            l = loss_fns[task](_resize_to(ps[task], gt[task]), gt[task])
            out[f"scale_{scale}_{task}"] = l
            total = total + loss_weights[task] * l
    for task in tasks:
        l = loss_fns[task](pred[task], gt[task])
        out[task] = l
        total = total + loss_weights[task] * l
    out["total"] = total
    return out
