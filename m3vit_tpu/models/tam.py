"""TAM: task-attention fusion module over per-task decoder features.

reference: models/models.py:11-134 (TamModule) — concatenated per-task
features -> gating mask B -> weighted concat -> refine -> encoder/decoder
bottleneck -> modulation M -> per-task output convs.  The reference's
hand-unrolled 2/3/4/5-task gating weights are reproduced exactly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3vit_tpu.models.resnet import _bn

Dtype = Any


def _tam_gate_weights(n: int):
    """Per-task multipliers applied to (B, 1-B) in the gated concat
    (reference models.py:96-103)."""
    if n == 2:
        return [("b", 1.0), ("nb", 1.0)]
    if n == 3:
        return [("b", 1.0), ("nb", 0.5), ("nb", 0.5)]
    if n == 4:
        return [("b", 0.5), ("b", 0.5), ("nb", 0.5), ("nb", 0.5)]
    if n == 5:
        return [("b", 0.5), ("b", 0.5), ("nb", 1 / 3), ("nb", 1 / 3),
                ("nb", 1 / 3)]
    raise NotImplementedError(f"TAM supports 2-5 tasks, got {n}")


class TamModule(nn.Module):
    tasks: Sequence[str]
    input_channels: int
    num_outputs: Dict[str, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, deep_features: Dict[str, jnp.ndarray], train=False):
        n = len(self.tasks)
        ic = self.input_channels
        conv = lambda feats, k, s, name: nn.Conv(
            feats, (k, k), strides=(s, s),
            padding=((k // 2, k // 2), (k // 2, k // 2)),  # torch p=k//2,
            # symmetric even under stride 2 (SAME pads (0,1) on even inputs)
            dtype=self.dtype,
            name=name,
        )

        feats = [deep_features[t] for t in self.tasks]
        x = jnp.concatenate(feats, axis=-1)  # [B, H, W, n*ic]

        # block0: conv->bn->relu->conv->bn->sigmoid => gate B
        h = conv(ic, 3, 1, "layers0_conv")(x)
        h = _bn(train, "layers0_bn")(h)
        h = jax.nn.relu(h)
        h = conv(ic, 3, 1, "layers1_conv")(h)
        h = _bn(train, "layers1_bn")(h)
        B = jax.nn.sigmoid(h)

        parts = []
        for (kind, w), f in zip(_tam_gate_weights(n), feats):
            g = B if kind == "b" else (1.0 - B)
            parts.append(f * g * w)
        Fb = jnp.concatenate(parts, axis=-1)

        h = conv(ic, 3, 1, "layers2_conv")(Fb)
        h = _bn(train, "layers2_bn")(h)
        h = jax.nn.relu(h)

        # encoder (2x 2x-down) / decoder (2x ConvTranspose 2x-up) bottleneck
        h = conv(ic, 3, 2, "encoder0_conv")(h)
        h = jax.nn.relu(_bn(train, "encoder0_bn")(h))
        h = conv(ic, 3, 2, "encoder1_conv")(h)
        h = jax.nn.relu(_bn(train, "encoder1_bn")(h))

        def convT(x, name):
            # torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1)
            # alignment: VALID fractionally-strided conv cropped to
            # rows/cols [1, 2H+1) — flax 'SAME' aligns differently
            hh, ww = x.shape[1], x.shape[2]
            y = nn.ConvTranspose(ic, (3, 3), strides=(2, 2),
                                 padding="VALID", dtype=self.dtype,
                                 name=name)(x)
            return y[:, 1:1 + 2 * hh, 1:1 + 2 * ww, :]

        h = convT(h, "decoder0_conv")
        h = jax.nn.relu(_bn(train, "decoder0_bn")(h))
        h = convT(h, "decoder1_conv")
        h = _bn(train, "decoder1_bn")(h)
        M = jax.nn.sigmoid(h)

        Ftam = jnp.concatenate([f * (1.0 + M) for f in feats], axis=-1)

        out = {}
        for task in self.tasks:
            h = conv(256, 3, 1, f"layers3_{task}_conv")(Ftam)
            h = _bn(train, f"layers3_{task}_bn")(h)
            h = jax.nn.relu(h)
            out[task] = conv(self.num_outputs[task], 1, 1,
                             f"layers4_{task}")(h).astype(jnp.float32)
        return out
