"""Measure flash-attention Mosaic compile-time scaling with kernel
instance count (the flagship inlines 12 blocks x 5 task passes x fwd+bwd).

Usage: python scripts/bench_flash_compile.py [--depth 2] [--tasks 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--tasks", type=int, default=1)
    ap.add_argument("--flash", default="1")
    ap.add_argument("--cache", action="store_true",
                    help="enable the persistent compile cache")
    ap.add_argument("--scan_blocks", action="store_true",
                    help="scan over block pairs (one kernel instance per "
                         "pair program instead of depth/2)")
    ap.add_argument("--scan_tasks", action="store_true",
                    help="scan the per-task backbone passes (one backbone "
                         "program instead of T)")
    args = ap.parse_args()
    os.environ["M3VIT_FLASH_ATTN"] = args.flash
    if args.cache:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from __graft_entry__ import build_flagship
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.losses.functions import loss_fn_for_task
    from m3vit_tpu.tasks import parse_task_dictionary
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import create_train_state
    from m3vit_tpu.train.step import make_train_step

    full = parse_task_dictionary("PASCALContext", {
        "include_semseg": True, "include_human_parts": True,
        "include_sal": True, "include_edge": True, "include_normals": True,
        "edge_w": 0.95,
    })[0]
    tasks = full[: args.tasks]
    model, tasks = build_flagship(
        depth=args.depth, tasks=tasks, dtype=jnp.bfloat16,
        use_checkpointing=False, capacity_factor=1.25,
        scan_blocks=args.scan_blocks, scan_tasks=args.scan_tasks,
    )
    batch = synthetic_batch(jax.random.key(0), tasks, 8, (512, 512))
    p = {"optimizer": "sgd",
         "optimizer_kwargs": {"lr": 0.002, "momentum": 0.9,
                              "weight_decay": 1e-4},
         "scheduler": "poly", "epochs": 100}
    state = create_train_state(model, jax.random.key(1), batch,
                               build_optimizer(p, 100))
    loss_fns = {t.name: loss_fn_for_task(t.name, {"edge_w": 0.95})
                for t in tasks}
    weights = {t.name: 1.0 for t in tasks}
    step = make_train_step(model, [t.name for t in tasks], loss_fns, weights,
                           donate=True)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.key(2))
    float(metrics["loss_total"])
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        state, metrics = step(state, batch, jax.random.key(2))
    float(metrics["loss_total"])
    dt = (time.perf_counter() - t0) / 5
    n_attn = (2 if args.scan_blocks else args.depth) * (
        1 if args.scan_tasks else args.tasks)
    print(f"depth={args.depth} tasks={args.tasks} flash={args.flash} "
          f"scan_blocks={args.scan_blocks} scan_tasks={args.scan_tasks} "
          f"attn_instances={n_attn}: "
          f"compile {t_compile:.1f}s, step {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
