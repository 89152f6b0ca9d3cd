"""Profile the token persistent-sharing variant's train step on the TPU.

The token model's forward latency is ~110 ms at B=8 but the train step runs
~2.4 s — this isolates where the backward blows up.

Usage: python scripts/profile_token.py [--steps 2] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/m3vit_token_profile")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--loop", action="store_true",
                    help="per-task MoE dispatch loop (batched_dispatch off)")
    args = ap.parse_args()

    from m3vit_tpu.config import create_config
    from m3vit_tpu.models.factory import build_model
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.losses.functions import loss_fn_for_task
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import create_train_state
    from m3vit_tpu.train.step import make_train_step
    from m3vit_tpu.tasks import parse_task_dictionary

    p = create_config(None, "configs/pascal/token_moe_multi_task.yml",
                      {"use_checkpointing": args.remat,
                       "batched_dispatch": not args.loop}, make_dirs=False)
    model = build_model(p)
    tasks, _ = parse_task_dictionary(p["train_db_name"], p["task_dictionary"]), None
    tasks = tasks[0] if isinstance(tasks, tuple) else tasks
    batch = synthetic_batch(jax.random.key(0), tasks, args.batch, (512, 512))
    tx = build_optimizer(p, steps_per_epoch=100)
    state = create_train_state(model, jax.random.key(1), batch, tx)
    loss_fns = {t.name: loss_fn_for_task(t.name, {"edge_w": 0.95})
                for t in tasks}
    weights = p["loss_kwargs"]["loss_weights"]
    step = make_train_step(model, [t.name for t in tasks], loss_fns, weights,
                           donate=True)
    rng = jax.random.key(2)
    for _ in range(2):
        state, metrics = step(state, batch, rng)
    float(metrics["loss_total"])

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, metrics = step(state, batch, rng)
        float(metrics["loss_total"])

    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = step(state, batch, rng)
    float(metrics["loss_total"])
    dt = (time.perf_counter() - t0) / 3
    print(json.dumps({"step_time_s": round(dt, 4),
                      "imgs_per_sec": round(args.batch / dt, 2)}))

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ps", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "profile_step.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.report(args.out, 30, n_steps=args.steps, by_cat=True)


if __name__ == "__main__":
    main()
