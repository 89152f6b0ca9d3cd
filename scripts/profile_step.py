"""Profile the flagship train step on the real TPU and print a per-op/
per-category time breakdown.

Usage:
  python scripts/profile_step.py [--steps 3] [--batch 8] [--top 40]
      [--out /tmp/m3vit_profile] [--stacked] [--remat]

Parses the xplane.pb directly with tensorflow.tsl.profiler.protobuf.xplane_pb2
(the tensorboard profile-plugin converter is broken in this env; needs
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python — set automatically below).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


CATEGORY_PATTERNS = [
    ("conv", re.compile(r"^%?(convolution|conv)", re.I)),
    ("fusion", re.compile(r"^%?(loop_|input_|output_)?fusion", re.I)),
    ("dot", re.compile(r"^%?dot|^%?gemm|einsum", re.I)),
    ("copy", re.compile(r"^%?copy", re.I)),
    ("transpose", re.compile(r"^%?transpose", re.I)),
    ("allreduce", re.compile(r"all-reduce|all_reduce", re.I)),
    ("alltoall", re.compile(r"all-to-all|all_to_all", re.I)),
    ("sort", re.compile(r"^%?sort", re.I)),
    ("scatter", re.compile(r"^%?scatter", re.I)),
    ("gather", re.compile(r"^%?gather|^%?dynamic-slice", re.I)),
]


def categorize(name: str) -> str:
    for cat, pat in CATEGORY_PATTERNS:
        if pat.search(name):
            return cat
    return "other"


def parse_xplane(profile_dir: str, top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        raise SystemExit(f"no xplane.pb under {profile_dir}")
    path = files[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    per_op = collections.Counter()      # name -> total ps
    per_cat = collections.Counter()
    n_events = collections.Counter()
    total_ps = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            # 'XLA Ops' is the synchronous op timeline (sums to wall step
            # time); 'Async XLA Ops' are overlapped DMA copies whose
            # durations double-count
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps
                n_events[name] += 1
                per_cat[categorize(name)] += ev.duration_ps
                total_ps += ev.duration_ps
    return path, per_op, per_cat, n_events, total_ps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="/tmp/m3vit_profile")
    ap.add_argument("--stacked", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--no_shared_prefix", action="store_true",
                    help="profile the pre-shared-prefix variant (bench.py "
                         "defaults to shared_prefix on)")
    ap.add_argument("--parse-only", default=None,
                    help="skip running; parse this profile dir")
    args = ap.parse_args()

    if args.parse_only:
        report(args.parse_only, args.top, n_steps=args.steps, by_cat=True)
        return

    from __graft_entry__ import build_flagship
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.losses.functions import loss_fn_for_task
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import create_train_state
    from m3vit_tpu.train.step import make_train_step

    model, tasks = build_flagship(
        dtype=jnp.bfloat16, use_checkpointing=args.remat,
        stacked_tasks=args.stacked,
        shared_prefix=not (args.stacked or args.no_shared_prefix),
    )
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
    for _ in range(2):
        state, metrics = step(state, batch, rng)
    float(metrics["loss_total"])

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, metrics = step(state, batch, rng)
        float(metrics["loss_total"])

    t0 = time.perf_counter()
    for _ in range(5):
        state, metrics = step(state, batch, rng)
    float(metrics["loss_total"])
    dt = (time.perf_counter() - t0) / 5
    print(json.dumps({"step_time_s": round(dt, 4),
                      "imgs_per_sec": round(args.batch / dt, 2)}))
    report(args.out, args.top, n_steps=args.steps)


def report(profile_dir: str, top: int, n_steps: int | None = None,
           by_cat: bool = False):
    path, per_op, per_cat, n_events, total_ps = parse_xplane(profile_dir, top)
    print(f"# parsed {path}")
    print(f"# total device op time: {total_ps/1e9:.2f} ms"
          + (f" over {n_steps} steps -> {total_ps/1e9/n_steps:.2f} ms/step"
             if n_steps else ""))
    print("\n## by category (ms)")
    for cat, ps in per_cat.most_common():
        print(f"  {cat:12s} {ps/1e9:9.2f}")
    if by_cat:
        # aggregate by output-shape signature: where does the long tail go?
        # Tuple outputs bin by their LARGEST element, not the first — a
        # conv+BN-stats kOutput fusion is (f32[256], f32[256], bf16[8,...])
        # and binning it under f32[256] misreads convs-at-peak as a
        # small-reduce storm (see scripts/bench_head_bn.py)
        tuple_re = re.compile(r"=\s*\(([^)]*)\)\s*(?:fusion|custom-call)")
        shape_re = re.compile(r"([a-z0-9]+\[[0-9,]*\])")
        by_shape = collections.Counter()
        by_shape_n = collections.Counter()

        def _elems(s):
            n = 1
            for d in re.findall(r"\d+", s.split("[", 1)[1]):
                n *= int(d)
            return n

        for name, ps in per_op.items():
            m = tuple_re.search(name)
            cands = (shape_re.findall(m.group(1)) if m
                     else shape_re.findall(name.split(" = ", 1)[-1][:80]))
            sig = max(cands, key=_elems) if cands else "?"
            by_shape[sig] += ps
            by_shape_n[sig] += n_events[name]
        print("\n## by output shape (ms, events)")
        for sig, ps in by_shape.most_common(40):
            print(f"  {ps/1e9:9.2f}  x{by_shape_n[sig]:<6d} {sig}")
        for cat, _ in per_cat.most_common():
            print(f"\n## top ops in '{cat}' (ms, count)")
            shown = 0
            for name, ps in per_op.most_common():
                if categorize(name) != cat:
                    continue
                print(f"  {ps/1e9:9.2f}  x{n_events[name]:<5d} {name[:160]}")
                shown += 1
                if shown >= 15:
                    break
        return
    print(f"\n## top {top} ops (ms, count)")
    for name, ps in per_op.most_common(top):
        print(f"  {ps/1e9:9.2f}  x{n_events[name]:<5d} {name[:140]}")


if __name__ == "__main__":
    main()
