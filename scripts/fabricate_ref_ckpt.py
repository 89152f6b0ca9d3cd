"""Fabricate reference-format checkpoints sized to an experiment config.

Produces, under OUTDIR:
  * ``deit.pth``         — a DeiT-style dense pretrain checkpoint (the input
                           of the reference's export_to_mtl warm-start flow,
                           pretrain/export_to_mtl.py -> common_config.py:223-307)
  * ``mtl_ckpt.pth.tar`` — a rank-sharded reference MTL checkpoint DIRECTORY
                           ({rank}.pth files, utils/moe_utils.py:128-178)

Sizes come from the config itself: the script builds OUR model for the
config, takes its param template, and inverts it into the reference state
dict (utils/torch_interop.params_to_reference_sd) — so the fabricated files
import back with ZERO missing tensors.  Used by the --smoke stage-0 drill in
scripts/run_when_mounted.sh so the first real-checkpoint import needs no new
code.

Usage: python scripts/fabricate_ref_ckpt.py EXP_YML OUTDIR [--ranks 2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_yml")
    ap.add_argument("outdir")
    ap.add_argument("--ranks", type=int, default=2)
    ap.add_argument("--env_yml", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch

    from m3vit_tpu.config import create_config
    from m3vit_tpu.models.factory import build_model
    from m3vit_tpu.utils.torch_interop import (
        params_to_reference_sd,
        save_reference_sharded_checkpoint,
    )

    p = create_config(args.env_yml, args.exp_yml, make_dirs=False)
    tasks = [t.name for t in p["TASKS"]]
    kw = p.get("backbone_kwargs") or {}
    img = kw.get("img_size", p.get("train_scale", [512, 512]))
    embed = int(kw.get("embed_dim", 384))
    depth = int(kw.get("depth", 12))
    patch = int(kw.get("patch_size", 16))

    model = build_model(p, mesh=None)
    x = np.zeros((1, int(img[0]), int(img[1]), 3), np.float32)
    variables = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        x, train=False,
    )
    mg = len(tasks) if p.get("multi_gate") else 0
    sd = params_to_reference_sd(
        variables["params"], variables.get("batch_stats"), tasks,
        multi_gate_tasks=mg,
    )

    os.makedirs(args.outdir, exist_ok=True)

    # rank-sharded MTL directory
    mtl_dir = os.path.join(args.outdir, "mtl_ckpt.pth.tar")
    save_reference_sharded_checkpoint(
        sd, mtl_dir, args.ranks,
        extra={"epoch": 1,
               "args": {"world_size": args.ranks,
                        "moe_experts": int(p.get("moe_experts", 16))}},
    )
    print(f"fabricated {args.ranks}-rank MTL checkpoint dir: {mtl_dir} "
          f"({len(sd)} tensors)")

    # DeiT-style dense pretrain checkpoint (grid sized to a canonical 224
    # pretrain input so the pos-embed interpolation path is exercised)
    rng = np.random.RandomState(0)
    g = 224 // patch
    hidden = embed * 4
    deit = {
        "pos_embed": rng.randn(1, g * g + 1, embed).astype(np.float32) * .02,
        "cls_token": rng.randn(1, 1, embed).astype(np.float32) * 0.02,
        "patch_embed.proj.weight":
            rng.randn(embed, 3, patch, patch).astype(np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros(embed, np.float32),
    }
    for i in range(depth):
        pre = f"blocks.{i}."
        deit[pre + "norm1.weight"] = np.ones(embed, np.float32)
        deit[pre + "norm1.bias"] = np.zeros(embed, np.float32)
        deit[pre + "norm2.weight"] = np.ones(embed, np.float32)
        deit[pre + "norm2.bias"] = np.zeros(embed, np.float32)
        deit[pre + "attn.qkv.weight"] = \
            rng.randn(3 * embed, embed).astype(np.float32) * 0.02
        deit[pre + "attn.qkv.bias"] = np.zeros(3 * embed, np.float32)
        deit[pre + "attn.proj.weight"] = \
            rng.randn(embed, embed).astype(np.float32) * 0.02
        deit[pre + "attn.proj.bias"] = np.zeros(embed, np.float32)
        deit[pre + "mlp.fc1.weight"] = \
            rng.randn(hidden, embed).astype(np.float32) * 0.02
        deit[pre + "mlp.fc1.bias"] = np.zeros(hidden, np.float32)
        deit[pre + "mlp.fc2.weight"] = \
            rng.randn(embed, hidden).astype(np.float32) * 0.02
        deit[pre + "mlp.fc2.bias"] = np.zeros(embed, np.float32)
    deit_path = os.path.join(args.outdir, "deit.pth")
    torch.save({"model": {k: torch.as_tensor(v) for k, v in deit.items()}},
               deit_path)
    print(f"fabricated DeiT-style pretrain checkpoint: {deit_path} "
          f"({len(deit)} tensors)")


if __name__ == "__main__":
    main()
