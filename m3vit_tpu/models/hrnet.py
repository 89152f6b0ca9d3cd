"""HRNet-W18-small-v2 backbone (flax.linen, NHWC).

Capability match for the reference's seg_hrnet.py (models/backbones/
seg_hrnet.py + model_info/hrnet_w18.yml): stem /4, stage1 = 2 bottlenecks at
64ch, stages 2-4 with [18,36,72,144] channels, (1,3,2) modules of 2
BasicBlocks per branch, SUM fusion with bilinear upsample / strided-conv
downsample.  Returns the 4 multi-resolution streams.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3vit_tpu.models.resnet import BasicBlock, Bottleneck, _bn, _conv

Dtype = Any


def _resize(x, hw):
    b, h, w, c = x.shape
    if (h, w) == tuple(hw):
        return x
    return jax.image.resize(x, (b, hw[0], hw[1], c), "bilinear")


class HRModule(nn.Module):
    """One multi-resolution module: per-branch blocks + full fusion
    (reference: seg_hrnet.py HighResolutionModule)."""

    channels: Sequence[int]
    num_blocks: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train=False) -> List[jnp.ndarray]:
        nb = len(self.channels)
        # branch blocks
        ys = []
        for i, x in enumerate(xs):
            h = x
            for b in range(self.num_blocks):
                h = BasicBlock(self.channels[i], dtype=self.dtype,
                               name=f"branch{i}_block{b}")(h, train)
            ys.append(h)
        # fusion: out_i = sum_j fuse(y_j -> resolution/channels of i)
        outs = []
        for i in range(nb):
            acc = ys[i]
            for j in range(nb):
                if j == i:
                    continue
                if j > i:
                    # lower-res -> upsample: 1x1 conv + BN + bilinear
                    h = _conv(self.channels[i], 1, 1, 1, f"fuse{i}_{j}_conv",
                              self.dtype)(ys[j])
                    h = _bn(train, f"fuse{i}_{j}_bn")(h)
                    h = _resize(h, acc.shape[1:3])
                else:
                    # higher-res -> downsample: chain of stride-2 3x3 convs
                    h = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        h = _conv(ch, 3, 2, 1, f"fuse{i}_{j}_ds{k}_conv",
                                  self.dtype)(h)
                        h = _bn(train, f"fuse{i}_{j}_ds{k}_bn")(h)
                        if not last:
                            h = jax.nn.relu(h)
                acc = acc + h
            outs.append(jax.nn.relu(acc))
        return outs


class HighResolutionNet(nn.Module):
    channels: Sequence[int] = (18, 36, 72, 144)
    stage_modules: Sequence[int] = (1, 3, 2)  # stages 2, 3, 4
    stage1_blocks: int = 2
    num_blocks: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, task_id=None, train=False) -> List[jnp.ndarray]:
        x = x.astype(self.dtype)
        h = _conv(64, 3, 2, 1, "stem_conv1", self.dtype)(x)
        h = jax.nn.relu(_bn(train, "stem_bn1")(h))
        h = _conv(64, 3, 2, 1, "stem_conv2", self.dtype)(h)
        h = jax.nn.relu(_bn(train, "stem_bn2")(h))

        # stage 1: bottlenecks at 64 (output 256)
        for b in range(self.stage1_blocks):
            h = Bottleneck(64, downsample=(b == 0), dtype=self.dtype,
                           name=f"layer1_{b}")(h, train)

        # transitions + stages
        xs = [h]
        for stage_idx, n_modules in enumerate(self.stage_modules):
            nb = stage_idx + 2  # branches in this stage
            new_xs = []
            for i in range(nb):
                if i < len(xs):
                    src = xs[i]
                    if src.shape[-1] != self.channels[i]:
                        src = _conv(self.channels[i], 3, 1, 1,
                                    f"trans{nb}_{i}_conv", self.dtype)(src)
                        src = jax.nn.relu(
                            _bn(train, f"trans{nb}_{i}_bn")(src))
                    new_xs.append(src)
                else:
                    src = _conv(self.channels[i], 3, 2, 1,
                                f"trans{nb}_{i}_conv", self.dtype)(xs[-1])
                    src = jax.nn.relu(_bn(train, f"trans{nb}_{i}_bn")(src))
                    new_xs.append(src)
            xs = new_xs
            for m in range(n_modules):
                xs = HRModule(self.channels[:nb], self.num_blocks,
                              dtype=self.dtype,
                              name=f"stage{nb}_module{m}")(xs, train)
        return xs


def hrnet_w18(dtype=jnp.float32) -> HighResolutionNet:
    return HighResolutionNet(dtype=dtype)
