"""Decode heads (flax.linen, NHWC).

VisionTransformerUpHead: the PUP head — LN -> 2-D reshape -> 4x(conv3x3 + BN +
ReLU + 2x bilinear upsample) -> 1x1 conv (reference:
models/heads/vit_up_head.py:73-224).  BatchNorm here is the reference's
SyncBN: under pjit the batch axis is a sharded logical axis, so the batch
statistics are global by construction — no separate sync path needed.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """align_corners=False bilinear resize (half-pixel centers), NHWC."""
    b, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")


class VisionTransformerUpHead(nn.Module):
    img_size: Tuple[int, int] = (512, 512)
    patch_size: int = 16
    embed_dim: int = 384
    num_classes: int = 21
    num_conv: int = 4
    num_upsample_layer: int = 4
    conv3x3_conv1x1: bool = True
    return_tam_features: bool = False  # reference vit_up_head.py:194-213
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        h = self.img_size[0] // self.patch_size
        w = self.img_size[1] // self.patch_size

        if x.ndim == 3:
            # drop cls/dist tokens when present (reference :152-154)
            if x.shape[1] % 48 != 0:
                extra = x.shape[1] - h * w
                x = x[:, extra:]
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
            b, hw, c = x.shape
            x = x.reshape(b, h, w, c)

        x = x.astype(self.dtype)
        # BN statistics/affine stay f32 (SyncBN parity), but the normalized
        # activations are cast back to the model dtype immediately so the
        # relu -> 2x bilinear resize -> conv chain moves bf16, not f32
        # (measured: f32 inter-conv buffers at 256^2 cost ~10ms/step x5 heads)
        norm = lambda name: (lambda y: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )(y).astype(self.dtype))
        conv = lambda feats, k, name: nn.Conv(
            feats, kernel_size=(k, k), padding="SAME", dtype=self.dtype, name=name
        )

        if self.num_conv == 2:
            x = conv(256, 3 if self.conv3x3_conv1x1 else 1, "conv_0")(x)
            x = norm("syncbn_fc_0")(x)
            x = jax.nn.relu(x)
            if self.num_upsample_layer == 2:
                x = resize_bilinear(x, (x.shape[1] * 4, x.shape[2] * 4))
            x = conv(self.num_classes, 1, "conv_1")(x)
            x = resize_bilinear(x, self.img_size)
            return x

        assert self.num_conv == 4 and self.num_upsample_layer == 4
        x = conv(256, 3, "conv_0")(x)
        x = norm("syncbn_fc_0")(x)
        x = jax.nn.relu(x)
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = conv(256, 3, "conv_1")(x)
        x = norm("syncbn_fc_1")(x)
        x = jax.nn.relu(x)
        tam_f0 = x
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = conv(256, 3, "conv_2")(x)
        x = norm("syncbn_fc_2")(x)
        x = jax.nn.relu(x)
        tam_f1 = x
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = conv(256, 3, "conv_3")(x)
        x = norm("syncbn_fc_3")(x)
        x = jax.nn.relu(x)
        tam_f2 = x
        x = conv(self.num_classes, 1, "conv_4")(x)
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = x.astype(jnp.float32)
        if self.return_tam_features and train:
            return x, tam_f0, tam_f1, tam_f2
        return x
