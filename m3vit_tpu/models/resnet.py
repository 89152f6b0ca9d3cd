"""ResNet backbones with optional dilation (flax.linen, NHWC).

Capability match for the reference's resnet.py + resnet_dilated.py:
ResNet-18 (BasicBlock) / ResNet-50 (Bottleneck); ResnetDilated converts the
last two stages to dilated convs for output stride 8 (reference:
models/backbones/resnet_dilated.py:9-48 — stride-2 convs become stride 1 with
dilation d/2, other 3x3 convs get dilation d).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _conv(feats, k, s=1, d=1, name=None, dtype=jnp.float32):
    return nn.Conv(
        feats, (k, k), strides=(s, s), kernel_dilation=(d, d),
        padding=((d * (k // 2),) * 2, (d * (k // 2),) * 2) if k > 1 else "VALID",
        use_bias=False, dtype=dtype, name=name,
    )


def _bn(train, name=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32, name=name)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        h = _conv(self.features, 3, self.stride, self.dilation, "conv1",
                  self.dtype)(x)
        h = _bn(train, "bn1")(h)
        h = jax.nn.relu(h)
        h = _conv(self.features, 3, 1, self.dilation, "conv2", self.dtype)(h)
        h = _bn(train, "bn2")(h)
        if self.downsample:
            identity = _conv(self.features, 1, self.stride, 1, "ds_conv",
                             self.dtype)(x)
            identity = _bn(train, "ds_bn")(identity)
        return jax.nn.relu(h + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = features * 4
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        h = _conv(self.features, 1, 1, 1, "conv1", self.dtype)(x)
        h = jax.nn.relu(_bn(train, "bn1")(h))
        h = _conv(self.features, 3, self.stride, self.dilation, "conv2",
                  self.dtype)(h)
        h = jax.nn.relu(_bn(train, "bn2")(h))
        h = _conv(self.features * 4, 1, 1, 1, "conv3", self.dtype)(h)
        h = _bn(train, "bn3")(h)
        if self.downsample:
            identity = _conv(self.features * 4, 1, self.stride, 1, "ds_conv",
                             self.dtype)(x)
            identity = _bn(train, "ds_bn")(identity)
        return jax.nn.relu(h + identity)


class ResNet(nn.Module):
    """Feature extractor (no pool/fc); returns the stage-4 feature map."""

    block: str = "basic"  # 'basic' | 'bottleneck'
    layers: Sequence[int] = (2, 2, 2, 2)
    dilate_scale: int = 0  # 0 = no dilation; 8 or 16 like ResnetDilated
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, task_id=None, train=False):
        blk = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4

        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(
            x.astype(self.dtype))
        h = jax.nn.relu(_bn(train, "bn1")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        # stage dilation per ResnetDilated: scale 8 -> layer3 d2, layer4 d4
        dil = [1, 1, 1, 1]
        strides = [1, 2, 2, 2]
        if self.dilate_scale == 8:
            dil = [1, 1, 2, 4]
            strides = [1, 2, 1, 1]
        elif self.dilate_scale == 16:
            dil = [1, 1, 1, 2]
            strides = [1, 2, 2, 1]

        in_ch = 64
        for si, (w, n) in enumerate(zip(widths, self.layers)):
            for bi in range(n):
                stride = strides[si] if bi == 0 else 1
                # first conv of a converted stage keeps dilation d/2
                d = dil[si]
                if bi == 0 and d > 1:
                    d_first = max(d // 2, 1)
                else:
                    d_first = d
                need_ds = bi == 0 and (stride != 1 or in_ch != w * expansion)
                h = blk(
                    features=w, stride=stride, dilation=d_first if bi == 0 else d,
                    downsample=need_ds, dtype=self.dtype,
                    name=f"layer{si+1}_{bi}",
                )(h, train)
                in_ch = w * expansion
        return h


def resnet18(dilated: bool = False, dtype=jnp.float32) -> ResNet:
    return ResNet(block="basic", layers=(2, 2, 2, 2),
                  dilate_scale=8 if dilated else 0, dtype=dtype)


def resnet50(dilated: bool = False, dtype=jnp.float32) -> ResNet:
    return ResNet(block="bottleneck", layers=(3, 4, 6, 3),
                  dilate_scale=8 if dilated else 0, dtype=dtype)
