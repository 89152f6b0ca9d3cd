"""TrainState with batch-stats collection (for the SyncBN-equivalent heads)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(
    model,
    rng: jax.Array,
    sample_batch: Dict[str, jnp.ndarray],
    tx,
    train_kwargs: Optional[Dict] = None,
) -> TrainState:
    """Initialize model variables from a sample batch and wrap in TrainState.

    train_kwargs may carry a 'train' flag: train-only submodules (e.g. the
    TAM fusion heads) only materialize their parameters when initialized in
    train mode.
    """
    train_kwargs = dict(train_kwargs or {})
    train_flag = bool(train_kwargs.pop("train", False))
    p_rng, g_rng, d_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": p_rng, "gate_noise": g_rng, "dropout": d_rng},
        sample_batch["image"],
        train=train_flag,
        **train_kwargs,
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )
