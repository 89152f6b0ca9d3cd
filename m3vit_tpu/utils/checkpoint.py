"""Checkpointing via Orbax: one logical (global-expert) checkpoint.

The reference needs rank-sharded MoE checkpoint directories ({rank}.pth with
experts-only filtering for rank>0) plus merge logic at load
(reference: utils/moe_utils.py:128-198, train_fastmoe.py:525-597).  Under
jax.sharding the parameters are already logically global — Orbax saves the
global array regardless of how it is sharded over chips, so resume is
world-size independent by construction (the property the reference's
`mtl_*_global.pth` format approximates).

Metadata (epoch, best results) is stored as a plain json sidecar.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional, Tuple

import orbax.checkpoint as ocp


def _mgr(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_checkpoint(
    directory: str, state, epoch: int, extra: Optional[Dict] = None
) -> None:
    """Save with overwrite semantics like the reference's torch.save
    (train_utils.py) — but crash-safe: when the step already exists, the new
    checkpoint is first fully committed under a staging root and only then
    swapped in (two same-filesystem renames).  A naive delete-then-save
    would destroy the only valid copy of that step if the process died
    mid-save — exactly the SIGTERM-preemption window this path serves
    (ADVICE r2)."""
    os.makedirs(directory, exist_ok=True)
    mgr = _mgr(directory)
    exists = epoch in mgr.all_steps()
    if not exists:
        mgr.save(epoch, args=ocp.args.StandardSave({"state": state}),
                 force=True)
        mgr.wait_until_finished()
        mgr.close()
    else:
        mgr.close()
        staging_root = os.path.join(directory, ".staging")
        shutil.rmtree(staging_root, ignore_errors=True)
        smgr = _mgr(staging_root)
        smgr.save(epoch, args=ocp.args.StandardSave({"state": state}),
                  force=True)
        smgr.wait_until_finished()
        smgr.close()
        old = os.path.join(directory, str(epoch))
        trash = os.path.join(directory, ".staging", f"_old_{epoch}")
        os.rename(old, trash)
        os.rename(os.path.join(staging_root, str(epoch)), old)
        shutil.rmtree(staging_root, ignore_errors=True)
    with open(os.path.join(directory, f"meta_{epoch}.json"), "w") as f:
        json.dump({"epoch": epoch, **(extra or {})}, f)


def latest_epoch(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _mgr(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(
    directory: str, state, epoch: Optional[int] = None
) -> Tuple[Optional[object], Optional[Dict]]:
    """Restore into the `state` template; returns (state, meta-dict) or
    (None, None) when no checkpoint exists."""
    if not os.path.isdir(directory):
        return None, None
    mgr = _mgr(directory)
    step = epoch if epoch is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return None, None
    restored = mgr.restore(step, args=ocp.args.StandardRestore({"state": state}))
    mgr.close()
    meta_path = os.path.join(directory, f"meta_{step}.json")
    meta = {"epoch": step}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored["state"], meta
