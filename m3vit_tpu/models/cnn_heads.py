"""CNN decode heads: DeepLab ASPP and HRNet fuse/head (flax.linen, NHWC).

reference: models/heads/aspp.py (DeepLabHead/ASPP) and
models/backbones/seg_hrnet.py:457-506 (HighResolutionFuse/Head).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3vit_tpu.models.resnet import _bn, _conv

Dtype = Any


class ASPP(nn.Module):
    atrous_rates: Sequence[int] = (12, 24, 36)
    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        res = []
        h = _conv(self.out_channels, 1, 1, 1, "conv0", self.dtype)(x)
        res.append(jax.nn.relu(_bn(train, "bn0")(h)))
        for i, rate in enumerate(self.atrous_rates):
            h = _conv(self.out_channels, 3, 1, rate, f"conv{i+1}", self.dtype)(x)
            res.append(jax.nn.relu(_bn(train, f"bn{i+1}")(h)))
        # global pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = _conv(self.out_channels, 1, 1, 1, "pool_conv", self.dtype)(g)
        g = jax.nn.relu(_bn(train, "pool_bn")(g))
        g = jnp.broadcast_to(g, res[0].shape)
        res.append(g)

        h = jnp.concatenate(res, axis=-1)
        h = _conv(self.out_channels, 1, 1, 1, "proj_conv", self.dtype)(h)
        h = jax.nn.relu(_bn(train, "proj_bn")(h))
        if train:
            h = nn.Dropout(0.5, deterministic=False)(h)
        return h


class DeepLabHead(nn.Module):
    num_classes: int = 21
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        h = ASPP(dtype=self.dtype, name="aspp")(x, train)
        h = _conv(256, 3, 1, 1, "conv", self.dtype)(h)
        h = jax.nn.relu(_bn(train, "bn")(h))
        h = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="classifier")(h)
        return h.astype(jnp.float32)


def _fuse_streams(xs: List[jnp.ndarray]) -> jnp.ndarray:
    hw = xs[0].shape[1:3]
    ups = [xs[0]]
    for x in xs[1:]:
        b, h, w, c = x.shape
        ups.append(jax.image.resize(x, (b, hw[0], hw[1], c), "bilinear"))
    return jnp.concatenate(ups, axis=-1)


class HighResolutionFuse(nn.Module):
    """Concat 4 streams at the highest resolution + 1x1 conv (backbone-side
    fusion used by multi-task HRNet setups)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train=False):
        h = _fuse_streams(xs)
        h = _conv(h.shape[-1], 1, 1, 1, "conv", self.dtype)(h)
        return jax.nn.relu(_bn(train, "bn")(h))


class HighResolutionHead(nn.Module):
    num_classes: int = 21
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train=False):
        if isinstance(xs, (list, tuple)):
            h = _fuse_streams(list(xs))
        else:
            h = xs
        c = h.shape[-1]
        h = _conv(c, 1, 1, 1, "conv0", self.dtype)(h)
        h = jax.nn.relu(_bn(train, "bn0")(h))
        h = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="conv1")(h)
        return h.astype(jnp.float32)
