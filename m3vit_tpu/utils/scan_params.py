"""Convert VisionTransformerMoE params between the per-block loop layout
(``block_0`` … ``block_{depth-1}``) and the ``scan_blocks`` layout
(``blocks_scan/{dense,moe}`` with a stacked [depth/2] leading axis).

The loop layout is the canonical storage format — it is what
``utils.torch_interop`` produces from reference checkpoints and what
non-scan models save — so checkpoints move between the two model modes
through these two pure functions.  Even blocks are dense, odd blocks are
MoE (reference ckpt/vision_transformer_moe.py:643-657).
"""

from __future__ import annotations

import jax
import numpy as np


def loop_to_scan(backbone_params: dict, depth: int) -> dict:
    """[block_0 .. block_{depth-1}] -> blocks_scan/{dense,moe} stacked.

    Pure host-side relayout (numpy): never allocates on or initializes a
    device backend, so it is safe to run next to a live TPU process."""
    if depth % 2 != 0:
        raise ValueError(f"scan layout requires even depth, got {depth}")
    out = {k: v for k, v in backbone_params.items()
           if not k.startswith("block_")}
    dense = [backbone_params[f"block_{2 * i}"] for i in range(depth // 2)]
    moe = [backbone_params[f"block_{2 * i + 1}"] for i in range(depth // 2)]
    stack = lambda *xs: np.stack([np.asarray(x) for x in xs])  # noqa: E731
    out["blocks_scan"] = {
        "dense": jax.tree.map(stack, *dense),
        "moe": jax.tree.map(stack, *moe),
    }
    return out


def scan_to_loop(backbone_params: dict, depth: int) -> dict:
    """blocks_scan/{dense,moe} stacked -> [block_0 .. block_{depth-1}]
    (host-side numpy, see loop_to_scan)."""
    if depth % 2 != 0:
        raise ValueError(f"scan layout requires even depth, got {depth}")
    out = {k: v for k, v in backbone_params.items() if k != "blocks_scan"}
    stacked = backbone_params["blocks_scan"]
    for i in range(depth // 2):
        out[f"block_{2 * i}"] = jax.tree.map(
            lambda x, i=i: np.asarray(x)[i], stacked["dense"])
        out[f"block_{2 * i + 1}"] = jax.tree.map(
            lambda x, i=i: np.asarray(x)[i], stacked["moe"])
    return out
