"""Decoupled gate network: a small ViT whose token features drive the MoE
routers (--moe_gate_arch).

reference: models/backbones/vits_gate.py — VisionTransformerMoCo with fixed
2-D sin-cos positional embeddings and MoCo-v3 initialization; the wrapper
VisionTransformerMoCoWithGate feeds its features as gate_inp to every MoE
gate (gate_dim = gate model feature dim).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from m3vit_tpu.models.vit import DenseBlock, PatchEmbed

Dtype = Any


def sincos_2d_pos_embed(h: int, w: int, dim: int,
                        temperature: float = 10000.0) -> np.ndarray:
    """Fixed 2-D sin-cos position embedding (reference vits_gate.py:69-85)."""
    assert dim % 4 == 0
    grid_w, grid_h = np.meshgrid(np.arange(w, dtype=np.float32),
                                 np.arange(h, dtype=np.float32))
    pos_dim = dim // 4
    omega = 1.0 / temperature ** (
        np.arange(pos_dim, dtype=np.float32) / pos_dim
    )
    out_w = np.einsum("m,d->md", grid_w.flatten(), omega)
    out_h = np.einsum("m,d->md", grid_h.flatten(), omega)
    pos = np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )[None]
    return pos.astype(np.float32)


class GateViT(nn.Module):
    """Small ViT producing per-token gate features (all tokens returned)."""

    img_size: Tuple[int, int] = (512, 512)
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = x.shape[0]
        h = self.img_size[0] // self.patch_size
        w = self.img_size[1] // self.patch_size
        tokens = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                            name="patch_embed")(x.astype(self.dtype))
        cls = self.param("cls_token",
                         nn.initializers.normal(1e-6),
                         (1, 1, self.embed_dim), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(self.dtype),
             tokens], axis=1,
        )
        pos = jnp.asarray(sincos_2d_pos_embed(h, w, self.embed_dim))
        cls_pos = jnp.zeros((1, 1, self.embed_dim), jnp.float32)
        tokens = tokens + jnp.concatenate([cls_pos, pos], 1).astype(self.dtype)
        for i in range(self.depth):
            tokens = DenseBlock(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=True, dtype=self.dtype, name=f"block_{i}",
            )(tokens, train)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(
            tokens.astype(jnp.float32)
        )


def vit_gate_small(img_size=(512, 512), dtype=jnp.float32) -> GateViT:
    return GateViT(img_size=img_size, embed_dim=384, depth=12, num_heads=12,
                   dtype=dtype)


def vit_gate_base(img_size=(512, 512), dtype=jnp.float32) -> GateViT:
    return GateViT(img_size=img_size, embed_dim=768, depth=12, num_heads=12,
                   dtype=dtype)


class MoEViTWithGate(nn.Module):
    """Backbone wrapper: gate ViT features -> gate_inp of every MoE router
    (reference VisionTransformerMoCoWithGate, vits_gate.py:24-37)."""

    backbone: nn.Module  # VisionTransformerMoE
    gate_model: nn.Module  # GateViT

    def __call__(self, x, task_id=None, train: bool = False, **kw):
        gate_inp = self.gate_model(x, train=train)
        return self.backbone(x, task_id=task_id, train=train,
                             gate_inp=gate_inp, **kw)
