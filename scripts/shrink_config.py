"""Shrink an experiment config to smoke scale (tiny shapes, 2 epochs).

Used by `scripts/run_when_mounted.sh --smoke` to drill the real-data
playbook against the fabricated dataset tree: the REAL config file is read
(so config paths, task dictionaries, loss schemes, head wiring are all
exercised) and only the scale knobs are shrunk so the run completes in
seconds on CPU.

Usage: python scripts/shrink_config.py in.yml out.yml
"""

from __future__ import annotations

import sys

import yaml

SMALL = 64


def shrink(cfg: dict) -> dict:
    cfg = dict(cfg)
    # unconditional: many configs rely on the per-dataset default scale
    for k in ("train_scale", "test_scale"):
        cfg[k] = [SMALL, SMALL]
    cfg["trBatch"] = 2
    cfg["valBatch"] = 2
    cfg["nworkers"] = 0
    cfg["epochs"] = 2
    cfg["eval_interval"] = 2
    cfg["eval_final_10_epochs_only"] = False
    cfg["use_checkpointing"] = False
    cfg["compute_dtype"] = "float32"  # smoke runs on CPU

    bk = dict(cfg.get("backbone_kwargs") or {})
    old_embed = bk.get("embed_dim")
    if "img_size" in bk:
        bk["img_size"] = [SMALL, SMALL]
    if "embed_dim" in bk:
        bk["embed_dim"] = SMALL
    if "depth" in bk:
        bk["depth"] = 2
    if "num_heads" in bk:
        bk["num_heads"] = 4
    if "gate_dim" in bk and old_embed:
        # gate_dim = embed (+ num_tasks for the multi-gate one-hot)
        bk["gate_dim"] = SMALL + (int(bk["gate_dim"]) - int(old_embed))
    if "pretrained" in bk:
        bk["pretrained"] = False  # no pretrained weights in the smoke env
    if bk:
        cfg["backbone_kwargs"] = bk

    hk = dict(cfg.get("head_kwargs") or {})
    if "img_size" in hk:
        hk["img_size"] = [SMALL, SMALL]
    if "embed_dim" in hk:
        hk["embed_dim"] = SMALL
    if hk:
        cfg["head_kwargs"] = hk

    if "moe_experts" in cfg:
        cfg["moe_experts"] = 8
    if "moe_top_k" in cfg:
        cfg["moe_top_k"] = 2
    if "backbone_kwargs" in cfg and "moe_top_k" in cfg["backbone_kwargs"]:
        cfg["backbone_kwargs"]["moe_top_k"] = 2
    return cfg


def main():
    src, dst = sys.argv[1], sys.argv[2]
    with open(src) as f:
        cfg = yaml.safe_load(f)
    with open(dst, "w") as f:
        yaml.safe_dump(shrink(cfg), f)
    print(f"shrunk {src} -> {dst}")


if __name__ == "__main__":
    main()
