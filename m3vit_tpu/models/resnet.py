"""ResNet backbones with optional dilation and stage-wise access (flax, NHWC).

Capability match for the reference's resnet.py + resnet_dilated.py:
ResNet-18 (BasicBlock) / ResNet-50 (Bottleneck); ResnetDilated converts the
last two stages to dilated convs for output stride 8 (reference:
models/backbones/resnet_dilated.py:9-48).  Stage-wise entry points
(forward_stem / forward_stage / *_except_last_block) support the MTL methods
(cross-stitch, NDDR, MTAN; reference mtl_methods/*.py call forward_stage).
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
    # second-conv dilation; 0 = same as `dilation`.  The reference's
    # _nostride_dilate (resnet_dilated.py:35-48) gives the ex-stride conv
    # dilate//2 but every OTHER 3x3 the full dilate — so the first block of
    # a dilated stage has asymmetric conv dilations.
    dilation2: int = 0
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        h = _conv(self.features, 3, self.stride, self.dilation, "conv1",
                  self.dtype)(x)
        h = _bn(train, "bn1")(h)
        h = jax.nn.relu(h)
        d2 = self.dilation2 or self.dilation
        h = _conv(self.features, 3, 1, d2, "conv2", self.dtype)(h)
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
    """Feature extractor (no pool/fc); __call__ returns the stage-4 map."""

    block: str = "basic"  # 'basic' | 'bottleneck'
    layers: Sequence[int] = (2, 2, 2, 2)
    dilate_scale: int = 0  # 0 = none; 8 or 16 like ResnetDilated
    dtype: Dtype = jnp.float32

    @property
    def stage_channels(self):
        exp = 1 if self.block == "basic" else 4
        return [64 * exp, 128 * exp, 256 * exp, 512 * exp]

    def setup(self):
        blk = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4
        widths = (64, 128, 256, 512)
        dil = [1, 1, 1, 1]
        strides = [1, 2, 2, 2]
        if self.dilate_scale == 8:
            dil, strides = [1, 1, 2, 4], [1, 2, 1, 1]
        elif self.dilate_scale == 16:
            dil, strides = [1, 1, 1, 2], [1, 2, 2, 1]

        self.conv1 = nn.Conv(64, (7, 7), strides=(2, 2),
                             padding=((3, 3), (3, 3)), use_bias=False,
                             dtype=self.dtype, name="conv1")
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                dtype=jnp.float32, name="bn1")

        stages = []
        in_ch = 64
        for si, (w, n) in enumerate(zip(widths, self.layers)):
            blocks = []
            for bi in range(n):
                stride = strides[si] if bi == 0 else 1
                d = dil[si]
                d_eff = max(d // 2, 1) if (bi == 0 and d > 1) else d
                need_ds = bi == 0 and (stride != 1 or in_ch != w * expansion)
                kw = dict(features=w, stride=stride, dilation=d_eff,
                          downsample=need_ds, dtype=self.dtype,
                          name=f"layer{si+1}_{bi}")
                if blk is BasicBlock and bi == 0 and d > 1:
                    # the non-stride conv keeps the full stage dilation
                    kw["dilation2"] = d
                blocks.append(blk(**kw))
                in_ch = w * expansion
            stages.append(tuple(blocks))
        self.stages = tuple(stages)

    def forward_stem(self, x, train=False):
        h = self.conv1(x.astype(self.dtype))
        h = jax.nn.relu(self.bn1(h, use_running_average=not train))
        return nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    def forward_stage(self, x, stage: int, train=False, skip_last: bool = False):
        """Run stage `stage` (0-based); optionally stop before the last block
        (MTAN's forward_stage_except_last_block)."""
        blocks = self.stages[stage]
        upto = len(blocks) - 1 if skip_last else len(blocks)
        for b in blocks[:upto]:
            x = b(x, train)
        return x

    def forward_stage_last_block(self, x, stage: int, train=False):
        return self.stages[stage][-1](x, train)

    def __call__(self, x, task_id=None, train=False):
        h = self.forward_stem(x, train)
        for si in range(4):
            h = self.forward_stage(h, si, train)
        return h


def resnet18(dilated: bool = False, dtype=jnp.float32) -> ResNet:
    return ResNet(block="basic", layers=(2, 2, 2, 2),
                  dilate_scale=8 if dilated else 0, dtype=dtype)


def resnet50(dilated: bool = False, dtype=jnp.float32) -> ResNet:
    return ResNet(block="bottleneck", layers=(3, 4, 6, 3),
                  dilate_scale=8 if dilated else 0, dtype=dtype)
