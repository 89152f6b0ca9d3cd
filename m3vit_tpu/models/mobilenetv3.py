"""MobileNetV3 (large/small) feature extractor (flax.linen, NHWC).

Capability match for the reference's models/backbones/mobilenetv3.py:
inverted residual blocks with squeeze-excite and h-swish, returning the final
feature map (no pool/classifier).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3vit_tpu.models.resnet import _bn

Dtype = Any


def h_sigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


def h_swish(x):
    return x * h_sigmoid(x)


class Cfg(NamedTuple):
    kernel: int
    expand: int
    out: int
    se: bool
    act: str  # 'relu' | 'hswish'
    stride: int


LARGE = [
    Cfg(3, 16, 16, False, "relu", 1),
    Cfg(3, 64, 24, False, "relu", 2),
    Cfg(3, 72, 24, False, "relu", 1),
    Cfg(5, 72, 40, True, "relu", 2),
    Cfg(5, 120, 40, True, "relu", 1),
    Cfg(5, 120, 40, True, "relu", 1),
    Cfg(3, 240, 80, False, "hswish", 2),
    Cfg(3, 200, 80, False, "hswish", 1),
    Cfg(3, 184, 80, False, "hswish", 1),
    Cfg(3, 184, 80, False, "hswish", 1),
    Cfg(3, 480, 112, True, "hswish", 1),
    Cfg(3, 672, 112, True, "hswish", 1),
    Cfg(5, 672, 160, True, "hswish", 2),
    Cfg(5, 960, 160, True, "hswish", 1),
    Cfg(5, 960, 160, True, "hswish", 1),
]

SMALL = [
    Cfg(3, 16, 16, True, "relu", 2),
    Cfg(3, 72, 24, False, "relu", 2),
    Cfg(3, 88, 24, False, "relu", 1),
    Cfg(5, 96, 40, True, "hswish", 2),
    Cfg(5, 240, 40, True, "hswish", 1),
    Cfg(5, 240, 40, True, "hswish", 1),
    Cfg(5, 120, 48, True, "hswish", 1),
    Cfg(5, 144, 48, True, "hswish", 1),
    Cfg(5, 288, 96, True, "hswish", 2),
    Cfg(5, 576, 96, True, "hswish", 1),
    Cfg(5, 576, 96, True, "hswish", 1),
]


def _make_divisible(v, divisor=8):
    """Round to the nearest multiple of `divisor`, never dropping below 90%
    (reference mobilenetv3.py:15-32)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class SqueezeExcite(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        hidden = _make_divisible(self.channels // 4)
        s = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * h_sigmoid(s)


class InvertedResidual(nn.Module):
    cfg: Cfg
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = self.cfg
        act = jax.nn.relu if c.act == "relu" else h_swish
        identity = x
        h = x
        expanded = c.expand != x.shape[-1]
        if expanded:
            h = nn.Conv(c.expand, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand")(h)
            h = act(_bn(train, "expand_bn")(h))
        pad = c.kernel // 2
        h = nn.Conv(
            c.expand, (c.kernel, c.kernel), strides=(c.stride, c.stride),
            padding=((pad, pad), (pad, pad)), feature_group_count=c.expand,
            use_bias=False, dtype=self.dtype, name="dw",
        )(h)
        h = _bn(train, "dw_bn")(h)
        if expanded:
            # expanded blocks: dw-BN -> SE -> act (reference
            # mobilenetv3.py:105-119); non-expanded: dw-BN -> act -> SE
            if c.se:
                h = SqueezeExcite(c.expand, self.dtype, name="se")(h)
            h = act(h)
        else:
            h = act(h)
            if c.se:
                h = SqueezeExcite(c.expand, self.dtype, name="se")(h)
        h = nn.Conv(c.out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(h)
        h = _bn(train, "project_bn")(h)
        if c.stride == 1 and identity.shape[-1] == c.out:
            h = h + identity
        return h


class MobileNetV3(nn.Module):
    variant: str = "large"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, task_id=None, train=False):
        cfgs: Sequence[Cfg] = LARGE if self.variant == "large" else SMALL
        h = nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="stem")(
            x.astype(self.dtype))
        h = h_swish(_bn(train, "stem_bn")(h))
        for i, cfg in enumerate(cfgs):
            h = InvertedResidual(cfg, self.dtype, name=f"block{i}")(h, train)
        out_ch = 960 if self.variant == "large" else 576
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(h)
        return h_swish(_bn(train, "head_bn")(h))
