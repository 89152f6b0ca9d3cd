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
import jax.numpy as jnp


def loop_to_scan(backbone_params: dict, depth: int) -> dict:
    """[block_0 .. block_{depth-1}] -> blocks_scan/{dense,moe} stacked."""
    if depth % 2 != 0:
        raise ValueError(f"scan layout requires even depth, got {depth}")
    out = {k: v for k, v in backbone_params.items()
           if not k.startswith("block_")}
    dense = [backbone_params[f"block_{2 * i}"] for i in range(depth // 2)]
    moe = [backbone_params[f"block_{2 * i + 1}"] for i in range(depth // 2)]
    out["blocks_scan"] = {
        "dense": jax.tree.map(lambda *xs: jnp.stack(xs), *dense),
        "moe": jax.tree.map(lambda *xs: jnp.stack(xs), *moe),
    }
    return out


def scan_to_loop(backbone_params: dict, depth: int) -> dict:
    """blocks_scan/{dense,moe} stacked -> [block_0 .. block_{depth-1}]."""
    if depth % 2 != 0:
        raise ValueError(f"scan layout requires even depth, got {depth}")
    out = {k: v for k, v in backbone_params.items() if k != "blocks_scan"}
    stacked = backbone_params["blocks_scan"]
    for i in range(depth // 2):
        out[f"block_{2 * i}"] = jax.tree.map(
            lambda x, i=i: x[i], stacked["dense"])
        out[f"block_{2 * i + 1}"] = jax.tree.map(
            lambda x, i=i: x[i], stacked["moe"])
    return out
