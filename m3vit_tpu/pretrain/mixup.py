"""Mixup / CutMix with soft targets (DeiT-style pretraining augmentation).

Functional equivalents of timm's Mixup used by the reference pretrain loop
(reference: pretrain/engine/train_one_epoch.py:32-33).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def one_hot_smooth(labels: jnp.ndarray, num_classes: int,
                   smoothing: float = 0.0) -> jnp.ndarray:
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def mixup_cutmix(
    rng: jax.Array,
    images: jnp.ndarray,  # [B, H, W, C]
    labels: jnp.ndarray,  # [B] int
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    smoothing: float = 0.1,
    switch_prob: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-level mixup or cutmix (one mode per batch, like timm)."""
    B, H, W, _ = images.shape
    r_mode, r_lam_m, r_lam_c, r_pos = jax.random.split(rng, 4)
    targets = one_hot_smooth(labels, num_classes, smoothing)
    perm_targets = jnp.roll(targets, 1, axis=0)
    perm_images = jnp.roll(images, 1, axis=0)

    use_cutmix = jax.random.uniform(r_mode) < switch_prob

    # mixup branch
    lam_m = jax.random.beta(r_lam_m, mixup_alpha, mixup_alpha)
    mixed_m = lam_m * images + (1 - lam_m) * perm_images

    # cutmix branch: one box for the whole batch
    lam_c = jax.random.beta(r_lam_c, cutmix_alpha, cutmix_alpha)
    cut_ratio = jnp.sqrt(1.0 - lam_c)
    ch, cw = (cut_ratio * H).astype(jnp.int32), (cut_ratio * W).astype(jnp.int32)
    r_y, r_x = jax.random.split(r_pos)
    ry = jax.random.randint(r_y, (), 0, max(H, 1))
    rx = jax.random.randint(r_x, (), 0, max(W, 1))
    y0 = jnp.clip(ry - ch // 2, 0, H)
    x0 = jnp.clip(rx - cw // 2, 0, W)
    y1 = jnp.clip(ry + ch // 2, 0, H)
    x1 = jnp.clip(rx + cw // 2, 0, W)
    yy = jnp.arange(H)[None, :, None, None]
    xx = jnp.arange(W)[None, None, :, None]
    in_box = (yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1)
    mixed_c = jnp.where(in_box, perm_images, images)
    lam_c_eff = 1.0 - ((y1 - y0) * (x1 - x0)) / (H * W)

    images_out = jnp.where(use_cutmix, mixed_c, mixed_m)
    lam = jnp.where(use_cutmix, lam_c_eff, lam_m)
    targets_out = lam * targets + (1 - lam) * perm_targets
    return images_out, targets_out


def soft_target_cross_entropy(logits: jnp.ndarray,
                              targets: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(targets * logp).sum(-1).mean()
