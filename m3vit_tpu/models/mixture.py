"""Mixture backbone: per-task channel-gated dilated ResNet-50.

Capability match for the reference's mixture variant (reference:
models/backbones/resnet.py:347-785 MixtureBottleBlock/MixtureResNet +
shallow_embedding prior model; models/models.py:426-438
MultiTaskModel_Mixture; wired by p['model']=='mixture_baseline',
common_config.py:491-495):

  * every bottleneck conv output is multiplied by a per-task channel mask
    relu(Linear(y)) computed from a prior embedding y (task-conditioned
    channel pruning — zeroed channels prune compute in spirit)
  * last two stages dilated (output stride 8)
  * a shallow CNN prior model produces the gate embedding y from the image

The FLOP-cost bookkeeping of the reference (cal_flops) is exposed as the
per-block gate sparsity in the returned stats instead.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3vit_tpu.models.resnet import _bn, _conv

Dtype = Any


def _ones_init(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)  # reference init='1' fills gates with 1


class MixtureBottleneck(nn.Module):
    planes: int
    tasks: Sequence[str]
    input_dim: int = 10
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    # reference MixtureBottleBlock (backbones/resnet.py:347-512):
    # inner=True widens the two inner convs by `expand` (kk) and gates ONLY
    # them; the third (output) gate's parameters exist but are never applied
    expand: float = 1.0
    inner: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, task: str, train: bool = False):
        identity = x
        width = int(self.planes * self.expand) if self.inner else self.planes
        gates = {}
        for t in self.tasks:
            for g, dim in enumerate((width, width, self.planes * 4)):
                gates[(t, g)] = nn.Dense(
                    dim, use_bias=False, kernel_init=_ones_init,
                    name=f"gate_{t}_{g}",
                )
        if self.inner:
            # keep the unused output-gate parameters materialized like the
            # reference (they would otherwise be dropped from the tree)
            _ = gates[(task, 2)](y)

        def masked(out, g):
            mask = jax.nn.relu(gates[(task, g)](y))  # [B, C]
            return out * mask[:, None, None, :], (mask != 0).mean()

        h = _conv(width, 1, 1, 1, "conv1", self.dtype)(x)
        h = _bn(train, "bn1")(h)
        h, d0 = masked(h, 0)
        h = jax.nn.relu(h)
        h = _conv(width, 3, self.stride, self.dilation, "conv2", self.dtype)(h)
        h = _bn(train, "bn2")(h)
        h, d1 = masked(h, 1)
        h = jax.nn.relu(h)
        h = _conv(self.planes * 4, 1, 1, 1, "conv3", self.dtype)(h)
        h = _bn(train, "bn3")(h)
        if self.inner:
            density = (d0 + d1) / 2.0
        else:
            h, d2 = masked(h, 2)
            density = (d0 + d1 + d2) / 3.0
        if self.downsample:
            identity = _conv(self.planes * 4, 1, self.stride, 1, "ds_conv",
                             self.dtype)(x)
            identity = _bn(train, "ds_bn")(identity)
        return jax.nn.relu(h + identity), density


class ShallowEmbedding(nn.Module):
    """Small prior CNN: image -> gate embedding y [B, out_dim]
    (reference shallow_embedding_imagenet prior model)."""

    out_dim: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.astype(self.dtype)
        for i, f in enumerate((32, 64, 128)):
            h = _conv(f, 3, 2, 1, f"conv{i}", self.dtype)(h)
            h = jax.nn.relu(_bn(train, f"bn{i}")(h))
        h = h.mean(axis=(1, 2))
        return nn.Dense(self.out_dim, name="fc")(h)


class MixtureResNet(nn.Module):
    """Dilated mixture ResNet-50 feature extractor (output stride 8)."""

    tasks: Sequence[str]
    layers: Sequence[int] = (3, 4, 6, 3)
    input_dim: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, task: str, train: bool = False):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(
            x.astype(self.dtype))
        h = jax.nn.relu(_bn(train, "bn1")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        strides = [1, 2, 1, 1]
        dils = [1, 1, 2, 4]
        density = jnp.asarray(0.0, jnp.float32)
        n_blocks = 0
        in_ch = 64
        for si, (w, n) in enumerate(zip(widths, self.layers)):
            for bi in range(n):
                stride = strides[si] if bi == 0 else 1
                d = dils[si]
                d_eff = max(d // 2, 1) if bi == 0 and d > 1 else d
                need_ds = bi == 0 and (stride != 1 or in_ch != w * 4)
                h, dens = MixtureBottleneck(
                    planes=w, tasks=tuple(self.tasks),
                    input_dim=self.input_dim, stride=stride, dilation=d_eff,
                    downsample=need_ds, expand=2.0, inner=True,
                    dtype=self.dtype,
                    name=f"layer{si+1}_{bi}",
                )(h, y, task, train)
                density = density + dens
                n_blocks += 1
                in_ch = w * 4
        return h, density / n_blocks


class MultiTaskModelMixture(nn.Module):
    """Mixture encoder + task-specific decoders
    (reference models.py:426-438)."""

    backbone: MixtureResNet
    prior: ShallowEmbedding
    decoders: Dict[str, nn.Module]
    tasks: Sequence[str]

    @nn.compact
    def __call__(self, x, train: bool = False, single_task=None):
        from m3vit_tpu.models.heads import resize_bilinear

        out_size = x.shape[1:3]
        y = self.prior(x, train=train)
        out = {}
        density = jnp.asarray(0.0, jnp.float32)
        names = [single_task] if single_task is not None else list(self.tasks)
        for task in names:
            feats, dens = self.backbone(x, y, task, train=train)
            density = density + dens
            out[task] = resize_bilinear(
                self.decoders[task](feats, train=train), out_size
            )
        stats = {"gate_density": density / len(names)}
        return out, jnp.asarray(0.0, jnp.float32), stats
