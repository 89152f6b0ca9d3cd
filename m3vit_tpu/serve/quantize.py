"""Post-training weight-only int8 quantization of MoE expert banks.

Serving feature (no reference analogue — the reference serves by re-running
the training code in fp32, train_fastmoe.py:714-735): expert banks dominate
a MoE checkpoint's bytes, and single-task sparse inference at small batch is
weight-HBM-bound, so int8 expert weights halve both the artifact size and
the expert-weight HBM traffic.  Quantization is symmetric per
(expert, output-channel):

    scale[e, o] = max_i |w[e, i, o]| / 127;   w_q = round(w / scale)

`quantize_expert_tree` converts a trained float param tree into the tree a
model built with `expert_weights_int8=True` expects (`experts_w1` ->
`experts_w1_q` + `experts_w1_scale`); everything else is left untouched.
The quantized model is inference-only.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Tuple

import jax.numpy as jnp
import numpy as np

_QMAX = 127.0


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., E, d_in, d_out] float -> (int8 same shape, f32 scale
    [..., E, d_out]).  The reduction is always over d_in (axis -2) so the
    scan_blocks stacked layout ([depth/2, E, d_in, d_out]) quantizes
    per-(layer, expert, output-channel) identically to the loop layout."""
    w = np.asarray(w, np.float32)
    amax = np.abs(w).max(axis=-2)                    # [..., E, d_out]
    scale = np.where(amax > 0, amax / _QMAX, 1.0).astype(np.float32)
    q = np.clip(np.rint(w / scale[..., None, :]), -_QMAX, _QMAX).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale)


def dequantize_weight(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale[..., None, :]


def quantize_expert_tree(params, with_error: bool = False):
    """Replace every `experts_w1`/`experts_w2` leaf with its int8 + scale
    pair, recursively; returns a new tree (biases/gates/etc unchanged).
    with_error=True also returns the max relative dequantization error
    (computed from the same single quantization pass)."""
    worst = 0.0

    def walk(node):
        nonlocal worst
        if not isinstance(node, Mapping):
            return node
        out = {}
        for k, v in node.items():
            if k in ("experts_w1", "experts_w2"):
                q, s = quantize_weight(v)
                out[k + "_q"] = q
                out[k + "_scale"] = s
                if with_error:
                    deq = np.asarray(dequantize_weight(q, s))
                    w = np.asarray(v, np.float32)
                    denom = np.abs(w).max() or 1.0
                    worst = max(worst,
                                float(np.abs(deq - w).max() / denom))
            else:
                out[k] = walk(v)
        return out

    tree = walk(params)
    return (tree, worst) if with_error else tree


def expert_quantization_error(params) -> float:
    """Max relative dequantization error over all expert weights (sanity
    metric for logs/tests)."""
    worst = 0.0

    def walk(node):
        nonlocal worst
        if not isinstance(node, Mapping):
            return
        for k, v in node.items():
            if k in ("experts_w1", "experts_w2"):
                q, s = quantize_weight(v)
                deq = np.asarray(dequantize_weight(q, s))
                w = np.asarray(v, np.float32)
                denom = np.abs(w).max() or 1.0
                worst = max(worst, float(np.abs(deq - w).max() / denom))
            else:
                walk(v)

    walk(params)
    return worst
