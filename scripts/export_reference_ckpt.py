"""Export one of OUR Orbax checkpoints to the REFERENCE's checkpoint format.

The inverse of `--ref_ckpt`: reads a run's world-size-independent Orbax
checkpoint, rebuilds the model template from the experiment config, and
writes either

  * a single global ``.pth`` (``meta.expert_format='global'`` — what the
    reference's validate_single_file_moe_checkpoint_or_raise accepts,
    utils/moe_utils.py:34-106), or
  * a rank-sharded ``{rank}.pth`` DIRECTORY (``--ranks N``) in the exact
    layout the reference's distributed loader merges
    (train_fastmoe.py:525-545),

so a model trained here can be loaded by the reference's
``model.load_state_dict`` / ``--eval --ckp`` flow for cross-framework
evaluation or migration back.

Usage:
  python scripts/export_reference_ckpt.py --config_exp exp.yml \
      [--config_env env.yml] --ckp runs/.../checkpoint --out mtl_global.pth
  python scripts/export_reference_ckpt.py ... --out ckpt_dir --ranks 2
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_exp", required=True)
    ap.add_argument("--config_env", default=None)
    ap.add_argument("--ckp", required=True, help="Orbax checkpoint directory")
    ap.add_argument("--out", required=True,
                    help=".pth path (single global file) or a directory "
                         "path with --ranks > 1")
    ap.add_argument("--ranks", type=int, default=1)
    ap.add_argument("--epoch", type=int, default=None,
                    help="checkpoint step to export (default: latest)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch

    from m3vit_tpu.config import create_config
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.models.factory import build_model
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import create_train_state
    from m3vit_tpu.utils.checkpoint import restore_checkpoint
    from m3vit_tpu.utils.torch_interop import (
        params_to_reference_sd,
        save_reference_sharded_checkpoint,
    )

    p = create_config(args.config_env, args.config_exp, make_dirs=False)
    tasks = [t.name for t in p["TASKS"]]
    model = build_model(p, mesh=None)
    scale = p.get("train_scale", [512, 512])
    batch = synthetic_batch(jax.random.key(0), p["TASKS"], 1,
                            (int(scale[0]), int(scale[1])))
    tx = build_optimizer(p, steps_per_epoch=1)
    template = create_train_state(model, jax.random.key(1), batch, tx)
    state, meta = restore_checkpoint(args.ckp, template, epoch=args.epoch)
    if state is None:
        raise FileNotFoundError(f"no checkpoint under {args.ckp}")
    epoch = int(meta.get("epoch", -1)) if meta else -1

    mg = len(tasks) if p.get("multi_gate") else 0
    sd = params_to_reference_sd(state.params, state.batch_stats, tasks,
                                multi_gate_tasks=mg)
    extra = {
        "epoch": epoch,
        "args": {"world_size": args.ranks,
                 "moe_experts": int(p.get("moe_experts", 16))},
    }
    if args.ranks > 1:
        save_reference_sharded_checkpoint(sd, args.out, args.ranks,
                                          extra=extra)
        print(f"exported {len(sd)} tensors (epoch {epoch}) -> "
              f"{args.ranks}-rank reference dir {args.out}")
    else:
        out = dict(extra)
        out["state_dict"] = {k: torch.as_tensor(np.ascontiguousarray(v))
                             for k, v in sd.items()}
        out["meta"] = {"expert_format": "global"}
        torch.save(out, args.out)
        print(f"exported {len(sd)} tensors (epoch {epoch}) -> global "
              f"reference file {args.out}")


if __name__ == "__main__":
    main()
