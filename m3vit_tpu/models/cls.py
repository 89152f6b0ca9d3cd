"""Classification wrapper over the MoE ViT encoder (ImageNet pretraining).

reference: pretrain/models/moe_vit_cls.py — encoder + LayerNorm + linear head
on the cls token (plus optional distillation head); forward returns
{"logits", "cv_loss"}.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from m3vit_tpu.models.vit import trunc_normal_init
from m3vit_tpu.models.vit_moe import VisionTransformerMoE


class MoEViTForClassification(nn.Module):
    encoder: VisionTransformerMoE
    num_classes: int = 1000
    distilled: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        tokens, cv_loss, _ = self.encoder(x, task_id=jnp.asarray(0),
                                          train=train)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(
            tokens.astype(jnp.float32)
        )
        cls = h[:, 0]
        logits = nn.Dense(self.num_classes, kernel_init=trunc_normal_init,
                          name="head")(cls)
        if self.distilled:
            dist = h[:, 1]
            logits_dist = nn.Dense(
                self.num_classes, kernel_init=trunc_normal_init,
                name="head_dist",
            )(dist)
            logits = (logits + logits_dist) / 2.0
        return logits, cv_loss
