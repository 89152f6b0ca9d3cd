"""Expert pruning utilities — the moe_utils.py equivalents.

reference: utils/moe_utils.py:251-298 — average per-expert gate activation
over a loader, keep the top-N experts per gate, then mask routing.  Here the
TPU-idiomatic form is *parameter surgery*: slice the expert banks and gate
columns down to the selected experts and run a smaller compiled model — true
zero-overhead single-task pathways (static shapes), instead of runtime masks.
Runtime masking is also available via the `expert_mask` model input.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

EXPERT_KEYS = ("experts_w1", "experts_b1", "experts_w2", "experts_b2")


def collect_expert_usage(
    apply_gates_fn: Callable, batches, num_blocks: int
) -> List[np.ndarray]:
    """Average softmax gate activation per MoE block over batches.

    apply_gates_fn(batch) -> list of [T, E] gate probability arrays (one per
    MoE block; e.g. the dense `gates` field of each block's GateOutput).
    """
    sums: Optional[List[np.ndarray]] = None
    count = 0
    for batch in batches:
        gates = apply_gates_fn(batch)
        assert len(gates) == num_blocks
        g = [np.asarray(x).sum(0) for x in gates]
        t = np.asarray(gates[0]).shape[0]
        sums = g if sums is None else [a + b for a, b in zip(sums, g)]
        count += t
    return [s / max(count, 1) for s in sums]


def select_top_experts(usage: List[np.ndarray], keep: int) -> List[np.ndarray]:
    """Top-`keep` experts per gate by mean activation
    (reference moe_utils.py:289-296)."""
    return [np.sort(np.argsort(-u)[:keep]) for u in usage]


def usage_to_masks(select: List[np.ndarray], num_experts: int) -> List[jnp.ndarray]:
    masks = []
    for idx in select:
        m = np.zeros(num_experts, bool)
        m[np.asarray(idx)] = True
        masks.append(jnp.asarray(m))
    return masks


def prune_experts_in_params(
    params: Dict, select_per_block: Dict[str, np.ndarray]
) -> Dict:
    """Slice expert banks (dim 0) and gate columns (last dim) to the selected
    experts.  select_per_block maps block param-path prefix (e.g. 'block_1')
    to an index array.  Returns a new param tree for a model built with
    moe_experts = len(select)."""

    def walk(tree, block_name=None):
        out = {}
        for k, v in tree.items():
            sel = select_per_block.get(k, None)
            if isinstance(v, dict):
                out[k] = walk(v, block_name=k if sel is not None else block_name)
            else:
                cur_sel = select_per_block.get(block_name)
                if cur_sel is None:
                    out[k] = v
                elif k in EXPERT_KEYS:
                    out[k] = jnp.take(v, jnp.asarray(cur_sel), axis=0)
                elif k == "w_gate":
                    out[k] = jnp.take(v, jnp.asarray(cur_sel), axis=-1)
                else:
                    out[k] = v
        return out

    return walk(params)
