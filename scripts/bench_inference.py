"""Inference benchmarks: single-task sparse pathway vs full multi-task.

The reference's headline capability (README.md:8-20): task-dependent MoE
lets single-task inference activate only that task's router pathway + one
decoder.  Measures both modes on the flagship (eval, no gate noise).

Usage: python scripts/bench_inference.py [--batch 8] [--iters 20]
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
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from __graft_entry__ import build_flagship
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.train.step import make_eval_step, make_single_task_eval_step

    # shared_prefix also accelerates the full multi-task eval forward (the
    # prefix is task-independent in eval too); single_task takes its own
    # path and is unaffected
    model, tasks = build_flagship(dtype=jnp.bfloat16, use_checkpointing=False,
                                  shared_prefix=True)
    batch = synthetic_batch(jax.random.key(0), tasks, args.batch, (512, 512))
    variables = model.init(
        {"params": jax.random.key(1)}, batch["image"], train=False
    )

    from typing import NamedTuple

    class _State(NamedTuple):
        params: dict
        batch_stats: dict

    state = _State(params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}))

    def timed(fn, label):
        out = fn(state, batch)
        first = out[next(iter(out))]
        float(jnp.asarray(first).astype(jnp.float32).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(state, batch)
        first = out[next(iter(out))]
        float(jnp.asarray(first).astype(jnp.float32).ravel()[0])
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "mode": label, "ms_per_batch": round(dt * 1e3, 2),
            "imgs_per_sec": round(args.batch / dt, 2),
        }))
        return dt

    full = make_eval_step(model, [t.name for t in tasks])
    t_full = timed(full, "full_multi_task_5heads")
    single = make_single_task_eval_step(model, "semseg")
    t_single = timed(single, "single_task_semseg_sparse")
    print(json.dumps({"single_task_speedup": round(t_full / t_single, 2)}))


if __name__ == "__main__":
    main()
