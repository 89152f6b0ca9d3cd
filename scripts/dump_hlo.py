"""Compile the flagship train step and dump optimized HLO for inspection.

Usage: python scripts/dump_hlo.py [--out /tmp/flagship_hlo.txt]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/flagship_hlo.txt")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from __graft_entry__ import build_flagship
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.losses.functions import loss_fn_for_task
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import create_train_state
    from m3vit_tpu.train.step import make_train_step

    model, tasks = build_flagship(dtype=jnp.bfloat16, use_checkpointing=False,
                                  capacity_factor=2.0)
    batch = synthetic_batch(jax.random.key(0), tasks, args.batch, (512, 512))
    p = {"optimizer": "sgd",
         "optimizer_kwargs": {"lr": 0.002, "momentum": 0.9,
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
    compiled = jax.jit(step.__wrapped__, donate_argnums=(0,)).lower(
        state, batch, rng).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out}: {len(txt)} chars")
    ma = compiled.memory_analysis()
    print(f"temp {ma.temp_size_in_bytes/2**30:.2f} GiB, "
          f"argument {ma.argument_size_in_bytes/2**30:.2f} GiB, "
          f"output {ma.output_size_in_bytes/2**30:.2f} GiB")


if __name__ == "__main__":
    main()
