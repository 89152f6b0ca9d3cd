"""Synthetic multi-task batches with reference-faithful label encodings.

Used by smoke tests, the bench harness, and the multichip dry-run; shapes and
value ranges match the real pipeline's output (ignore label 255, unit-norm
normals, binary edge/sal maps, ImageNet-normalized images).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def synthetic_batch(
    rng: jax.Array,
    tasks,
    batch_size: int,
    img_size: Tuple[int, int],
    ignore_fraction: float = 0.1,
) -> Dict[str, jnp.ndarray]:
    H, W = img_size
    keys = jax.random.split(rng, len(tasks) + 2)
    batch = {
        "image": jax.random.normal(keys[0], (batch_size, H, W, 3), jnp.float32)
    }
    ignore_mask = (
        jax.random.uniform(keys[1], (batch_size, H, W, 1)) < ignore_fraction
    )

    for i, t in enumerate(tasks):
        k = keys[2 + i]
        if t.loss_kind == "softmax_ce":
            lab = jax.random.randint(
                k, (batch_size, H, W, 1), 0, t.num_output
            ).astype(jnp.float32)
            lab = jnp.where(ignore_mask, 255.0, lab)
        elif t.loss_kind in ("balanced_bce", "bce"):
            lab = (jax.random.uniform(k, (batch_size, H, W, 1)) > 0.9).astype(
                jnp.float32
            )
        elif t.loss_kind == "normals_l1":
            v = jax.random.normal(k, (batch_size, H, W, 3))
            lab = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
            lab = jnp.where(ignore_mask, 255.0, lab)
        elif t.loss_kind == "depth_l1":
            lab = jax.random.uniform(k, (batch_size, H, W, 1)) * 10.0
            lab = jnp.where(ignore_mask, 255.0, lab)
        else:
            raise NotImplementedError(t.loss_kind)
        batch[t.name] = lab
    return batch
