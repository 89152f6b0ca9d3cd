"""EP all-to-all overlap evidence (round-4 VERDICT weak #1 / next #2a).

Question: does XLA:TPU schedule the MoE dispatch/combine `all_to_all`s
asynchronously (``all-to-all-start``/``all-to-all-done`` pairs with expert
GEMMs between them), or synchronously like the reference's NCCL pair
(reference: models/moe/ckpt/custom_moe_layer.py:263-265)?

Only one physical v5e chip is attached here, so the 8-chip program is
AOT-compiled against a *topology description* (jax.experimental.topologies)
— no execution, schedule inspection only.  Falls back to reporting that the
topology API is unavailable in this environment (the CPU-mesh dryrun program
is NOT evidence: CPU collectives are always synchronous).

Usage: python scripts/dump_ep_schedule.py [--chips 8] [--chunks 1]
       [--out /tmp/ep_sched.txt]

Prints a JSON line: async op counts, what ops sit between start/done, and
whether expert GEMMs (fusions with dot) appear inside any in-flight window.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chips", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=1)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--out", default="/tmp/ep_sched.txt")
    ap.add_argument("--xla_opt", action="append", default=[],
                    help="compiler option k=v (e.g. "
                         "xla_tpu_enable_async_all_to_all=true); may repeat")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    try:
        from jax.experimental import topologies
    except ImportError:
        print(json.dumps({"error": "jax.experimental.topologies unavailable"}))
        return

    topo = None
    errors = {}
    for name in (f"v5e:{args.chips // 4}x4" if args.chips >= 4 else "v5e:1x1",
                 f"v5e:2x{args.chips // 2}",
                 f"v5litepod-{args.chips}"):
        try:
            topo = topologies.get_topology_desc(
                platform="tpu", topology_name=name)
            break
        except Exception as e:  # noqa: BLE001 - records why each form failed
            errors[name] = f"{type(e).__name__}: {e}"[:200]
    if topo is None:
        print(json.dumps({"error": "no topology description available",
                          "tried": errors}))
        return

    from jax.sharding import Mesh

    from __graft_entry__ import build_flagship
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.losses.functions import loss_fn_for_task
    from m3vit_tpu.parallel.mesh import shard_train_state  # noqa: F401
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import create_train_state
    from m3vit_tpu.train.step import make_train_step

    devs = np.array(topo.devices).reshape(1, args.chips)
    mesh = Mesh(devs, ("data", "expert"))
    model, tasks = build_flagship(
        img=args.img, embed=384, depth=4, heads=6, experts=16, top_k=4,
        mesh=mesh, expert_axis="expert", dtype=jnp.bfloat16,
        use_checkpointing=False, capacity_factor=1.25,
        use_pallas_dense_ffn=False, a2a_chunks=args.chunks,
    )
    batch = synthetic_batch(jax.random.key(0), tasks, args.chips * 8,
                            (args.img, args.img))
    p = {"optimizer": "sgd",
         "optimizer_kwargs": {"lr": 0.01, "momentum": 0.9,
                              "weight_decay": 1e-4},
         "scheduler": "poly", "epochs": 10}
    tx = build_optimizer(p, steps_per_epoch=10)
    # AOT: init shapes only (no devices to run on)
    state_shape = jax.eval_shape(
        lambda k: create_train_state(model, k, batch, tx), jax.random.key(1))
    loss_fns = {t.name: loss_fn_for_task(t.name, {"edge_w": 0.95})
                for t in tasks}
    weights = {"semseg": 1.0, "human_parts": 2.0, "sal": 5.0, "edge": 50.0,
               "normals": 10.0}
    step = make_train_step(model, [t.name for t in tasks], loss_fns, weights,
                           donate=False)

    from jax.sharding import NamedSharding, PartitionSpec as P

    def give_sharding(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                    sharding=NamedSharding(mesh, P()))

    # batch sharded over all axes on dim 0; state replicated except experts
    bsh = NamedSharding(mesh, P(("data", "expert")))
    batch_sds = {k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=bsh)
                 for k, v in batch.items()}
    state_sds = jax.tree.map(give_sharding, state_shape)
    rng_sd = jax.ShapeDtypeStruct((), jnp.uint32)  # placeholder; use real key

    lowered = step.lower(state_sds, batch_sds,
                         jax.ShapeDtypeStruct(jax.random.key(0).shape,
                                              jax.random.key(0).dtype))
    copts = {}
    for kv in args.xla_opt:
        k, _, v = kv.partition("=")
        copts[k] = {"true": True, "false": False}.get(v.lower(), v)
    compiled = lowered.compile(compiler_options=copts) if copts \
        else lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)

    lines = txt.splitlines()
    starts = [i for i, l in enumerate(lines) if "all-to-all-start" in l]
    dones = [i for i, l in enumerate(lines) if "all-to-all-done" in l]
    sync = [i for i, l in enumerate(lines)
            if re.search(r" all-to-all\(", l)]
    overlap_dots = 0
    for s in starts:
        d = next((j for j in dones if j > s), None)
        if d is None:
            continue
        between = "\n".join(lines[s + 1:d])
        if re.search(r"(dot|fusion|convolution)", between):
            overlap_dots += 1
    print(json.dumps({
        "async_starts": len(starts), "async_dones": len(dones),
        "sync_a2a": len(sync), "windows_with_compute": overlap_dots,
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
