"""Export a pretraining checkpoint to an MTL-loadable backbone param file.

reference: pretrain/export_to_mtl.py + utils/moe_checkpoint.py — there, rank
shards must be merged into a global-expert checkpoint.  Our Orbax checkpoints
are already global; export = take the encoder subtree (and optionally
replicate the single pretrain gate into per-task multi-gates, the
common_config.py:56-68 behavior), then save as a msgpack params file.

Usage:
  python -m m3vit_tpu.pretrain.export_to_mtl --ckpt /path/pretrain/ema \
      --out backbone_params.msgpack --num_tasks 5
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np
from flax import serialization


def replicate_gates_for_multigate(backbone_params: dict, num_tasks: int) -> dict:
    """Replicate a single pretrained w_gate [1, d, E] into per-task gates
    [T, d, E] (reference common_config.py:56-68)."""

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k == "w_gate" and v.shape[0] == 1:
                out[k] = jnp.tile(v, (num_tasks, 1, 1))
            else:
                out[k] = v
        return out

    return walk(backbone_params)


def export(ckpt_dir: str, out_path: str, num_tasks: int = 0):
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    restored = mgr.restore(step)
    mgr.close()
    state = restored["state"]
    params = state["params"]
    encoder = params.get("encoder", params)
    if num_tasks > 0:
        encoder = replicate_gates_for_multigate(encoder, num_tasks)
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(encoder))
    n = sum(np.asarray(x).size for x in _leaves(encoder))
    print(f"exported {n/1e6:.2f}M backbone params from step {step} -> {out_path}")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num_tasks", type=int, default=0,
                    help="replicate gate into this many per-task gates")
    args = ap.parse_args(argv)
    export(args.ckpt, args.out, args.num_tasks)


if __name__ == "__main__":
    main()
