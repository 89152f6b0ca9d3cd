"""Training-health check: N steps of the flagship on one synthetic batch.

Overfit sanity (the reference's `overfit` flag philosophy, SURVEY.md section 4):
all five task losses and the cv balance loss must fall monotonically-ish.
Used to validate perf-motivated changes (capacity factor, dtype layouts)
don't hurt optimization.

Usage: python scripts/train_health.py [--steps 300] [--cf 2.0] [--batch 8]
Prints one JSON line with first/last losses.
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--cf", type=float, default=2.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.002)
    args = ap.parse_args()

    from __graft_entry__ import build_flagship
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.losses.functions import loss_fn_for_task
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import create_train_state
    from m3vit_tpu.train.step import make_train_step

    model, tasks = build_flagship(dtype=jnp.bfloat16, use_checkpointing=False,
                                  capacity_factor=args.cf)
    batch = synthetic_batch(jax.random.key(0), tasks, args.batch, (512, 512))
    p = {"optimizer": "sgd",
         "optimizer_kwargs": {"lr": args.lr, "momentum": 0.9,
                              "weight_decay": 1e-4},
         "scheduler": "poly", "epochs": 100}
    tx = build_optimizer(p, steps_per_epoch=100)
    state = create_train_state(model, jax.random.key(1), batch, tx)
    loss_fns = {t.name: loss_fn_for_task(t.name, {"edge_w": 0.95})
                for t in tasks}
    weights = {"semseg": 1.0, "human_parts": 2.0, "sal": 5.0, "edge": 50.0,
               "normals": 10.0}
    step = make_train_step(model, [t.name for t in tasks], loss_fns, weights,
                           donate=True)
    rng = jax.random.key(2)

    first, last = None, None
    t0 = time.time()
    for i in range(args.steps):
        state, metrics = step(state, batch, rng)
        if i == 0:
            first = {k: float(v) for k, v in metrics.items()}
        if i % 50 == 0:
            print(f"# step {i}: total={float(metrics['loss_total']):.4f} "
                  f"cv={float(metrics['loss_cv']):.4f}", flush=True)
    last = {k: float(v) for k, v in metrics.items()}
    print(json.dumps({
        "cf": args.cf, "steps": args.steps,
        "wall_s": round(time.time() - t0, 1),
        "first": {k: round(v, 4) for k, v in first.items()},
        "last": {k: round(v, 4) for k, v in last.items()},
    }))


if __name__ == "__main__":
    main()
