"""Device mesh + sharding rules.

One 2-D logical mesh ('data', 'expert') replaces the reference's NCCL process
groups + fastmoe moe_group + DistributedGroupedDataParallel
(reference: train_fastmoe.py:268-312, 448-473):

  * batch: sharded over BOTH axes (pure data parallelism across all chips)
  * expert parameters (experts_w1/b1/w2/b2): sharded over 'expert' on dim 0
  * every other parameter + optimizer state: replicated

Gradient semantics fall out of the shardings: replicated-param grads are
all-reduced by GSPMD (the reference's allreduce_params,
train_utils.py:459-463); expert-param grads stay shard-local but are
all-reduced across 'data' only (the reference's DistributedGroupedDataParallel
group behavior) — also automatic.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EXPERT_PARAM_NAMES = ("experts_w1", "experts_b1", "experts_w2", "experts_b2")


def make_mesh(
    n_data: int = 1, n_expert: Optional[int] = None, devices=None,
    n_seq: int = 1,
) -> Mesh:
    """(data, expert) mesh; n_seq > 1 inserts a 'seq' axis between them
    (('data', 'seq', 'expert')) for sequence-parallel attention
    (parallel.seq_attention, SURVEY §5) — adjacent to 'expert' so both
    all_to_all families ride ICI neighbours."""
    devices = devices if devices is not None else jax.devices()
    if n_expert is None:
        n_expert = len(devices) // (n_data * n_seq)
    n = n_data * n_seq * n_expert
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    if n_seq > 1:
        arr = np.array(devices[:n]).reshape(n_data, n_seq, n_expert)
        return Mesh(arr, ("data", "seq", "expert"))
    arr = np.array(devices[:n]).reshape(n_data, n_expert)
    return Mesh(arr, ("data", "expert"))


def _is_expert_param(path) -> bool:
    for entry in path:
        key = getattr(entry, "key", None)
        if key in EXPERT_PARAM_NAMES:
            return True
    return False


def _leaf_spec(path) -> P:
    """Spec for one param/opt-state leaf: expert banks sharded over 'expert'
    on the expert dim, everything else replicated.  Under scan_blocks
    (models.vit_moe) expert params carry a leading [depth/2] stacked-layer
    axis ('blocks_scan' scope), so the expert dim moves to position 1."""
    if not _is_expert_param(path):
        return P()
    scanned = any(getattr(e, "key", None) == "blocks_scan" for e in path)
    return P(None, "expert") if scanned else P("expert")


def param_spec_tree(params) -> Any:
    """PartitionSpec pytree for a params pytree: experts sharded, rest replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_spec(path), params,
    )


def param_shardings(params, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_spec_tree(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs sharded over the data-parallel mesh axes on the batch dim
    ('seq' shards the token axis inside attention, never the batch)."""
    axes = tuple(a for a in mesh.axis_names if a != "seq")
    return NamedSharding(mesh, P(axes))


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: params/opt-state expert-aware, rest replicated."""
    p_sh = param_shardings(state.params, mesh)
    state = state.replace(params=jax.device_put(state.params, p_sh))

    def opt_leaf_sharding(path, leaf):
        return NamedSharding(mesh, _leaf_spec(path))

    opt_sh = jax.tree_util.tree_map_with_path(opt_leaf_sharding, state.opt_state)
    state = state.replace(opt_state=jax.device_put(state.opt_state, opt_sh))
    if state.batch_stats:
        rep = NamedSharding(mesh, P())
        state = state.replace(
            batch_stats=jax.tree.map(
                lambda x: jax.device_put(x, rep), state.batch_stats
            )
        )
    return state
