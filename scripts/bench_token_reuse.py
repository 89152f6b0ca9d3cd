"""Token-variant reuse-cache bench: multi-task inference with the
cross-task expert-output cache on vs off.

The reference ships the reuse plumbing dead (`reuse_bits=None` always,
token/vision_transformer_moe.py:673-812); ours is live: with all tasks in
the reuse set, the FIRST task whose shared token hits an expert fills a
static-shape cache and later tasks read it instead of recomputing — the
"persistent sharing" inference story at its logical end.

Usage: python scripts/bench_token_reuse.py [--batch 8] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--config", default="configs/pascal/token_moe_multi_task.yml")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--eval_cf", type=float, default=None,
                    help="override moe_eval_capacity_factor.  THE static-"
                         "shape reuse story: with the cache on, ~70%% of "
                         "expert slots go unused, so capacity (and with it "
                         "the expert GEMM + dispatch traffic, which are "
                         "shape-bound, not occupancy-bound) can be shrunk "
                         "~3x at zero drops — check the printed "
                         "dropped_frac stays 0")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from m3vit_tpu.config import create_config
    from m3vit_tpu.models.factory import build_model

    overrides = {"use_checkpointing": False}
    if args.eval_cf is not None:
        overrides["moe_eval_capacity_factor"] = args.eval_cf
    p = create_config(None, args.config, overrides, make_dirs=False)
    model = build_model(p)
    ntasks = len(p["TASK_NAMES"])
    H, W = p["train_scale"]

    img = jnp.zeros((args.batch, H, W, 3), jnp.bfloat16)
    variables = jax.jit(
        lambda r: model.init({"params": r}, img, train=False)
    )(jax.random.key(0))

    patch = int(p["backbone_kwargs"].get("patch_size", 16))
    N = (H // patch) * (W // patch) + 1
    allbits = jnp.full((args.batch, N), (1 << ntasks) - 1, jnp.int32)

    def fwd(variables, x, reuse):
        pred, _, stats = model.apply(variables, x, train=False,
                                     reuse_bits=reuse)
        return pred, stats

    for label, reuse in (("no_reuse", None), ("reuse_all", allbits)):
        f = jax.jit(lambda v, x: fwd(v, x, reuse))
        pred, stats = f(variables, img)
        float(jnp.sum(pred[p["TASK_NAMES"][0]].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            pred, stats = f(variables, img)
        float(jnp.sum(pred[p["TASK_NAMES"][0]].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / args.iters
        rec = {
            "variant": label,
            "ms_per_fwd": round(dt * 1e3, 1),
            "imgs_per_sec": round(args.batch / dt, 1),
        }
        for k in ("computed_tokens", "reused_tokens"):
            if stats and k in stats:
                rec[k] = float(stats[k])
        if stats and "dropped_slot_fraction" in stats:
            rec["dropped_frac"] = round(
                float(stats["dropped_slot_fraction"])
                / max(float(stats.get("moe_stat_count", 1.0)), 1.0), 6)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
