"""A/B bench: multi-gate per-task loop vs stacked [T*B] single pass.

Round-1 measured stacked SLOWER on v5e-1, but that was before the
scalar-scatter eliminations and the fused Pallas expert FFN; the MoE
dispatch cost structure changed, so re-measure (CLAUDE.md round-1
endpoint #3 / still-open findings).

Usage: python scripts/bench_stacked.py [--batch 8] [--steps 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def run(stacked: bool, batch_size: int, n_steps: int) -> float:
    from __graft_entry__ import build_flagship
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.losses.functions import loss_fn_for_task
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import create_train_state
    from m3vit_tpu.train.step import make_train_step

    model, tasks = build_flagship(
        mesh=None, expert_axis=None, dtype=jnp.bfloat16,
        use_checkpointing=False, capacity_factor=1.25,
        stacked_tasks=stacked,
    )
    batch = synthetic_batch(jax.random.key(0), tasks, batch_size, (512, 512))
    p = {
        "optimizer": "sgd",
        "optimizer_kwargs": {"lr": 0.002, "momentum": 0.9,
                             "weight_decay": 1e-4},
        "scheduler": "poly",
        "epochs": 100,
    }
    tx = build_optimizer(p, steps_per_epoch=100)
    state = create_train_state(model, jax.random.key(1), batch, tx)
    loss_fns = {t.name: loss_fn_for_task(t.name, {"edge_w": 0.95})
                for t in tasks}
    weights = {"semseg": 1.0, "human_parts": 2.0, "sal": 5.0, "edge": 50.0,
               "normals": 10.0}
    step = make_train_step(model, [t.name for t in tasks], loss_fns, weights,
                           donate=True)
    rng = jax.random.key(2)
    for _ in range(2):
        state, metrics = step(state, batch, rng)
    float(metrics["loss_total"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch, rng)
    float(metrics["loss_total"])
    dt = time.perf_counter() - t0
    return batch_size * n_steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--mode", choices=["both", "loop", "stacked"],
                    default="both")
    args = ap.parse_args()
    if args.mode in ("both", "loop"):
        v = run(False, args.batch, args.steps)
        print(f"loop    B={args.batch}: {v:.2f} img/s")
    if args.mode in ("both", "stacked"):
        v = run(True, args.batch, args.steps)
        print(f"stacked B={args.batch}: {v:.2f} img/s")


if __name__ == "__main__":
    main()
