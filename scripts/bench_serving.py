"""Serving latency bench: bucketed AOT single-task inference (serve/).

Measures per-request latency percentiles for the flagship's sparse
single-task pathway (semseg) through InferenceSession at several batch
buckets — the deployment-side companion to scripts/bench_inference.py
(which measures batched eval throughput).

Usage: python scripts/bench_serving.py [--requests 50] [--buckets 1 2 4 8]
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=50)
    ap.add_argument("--buckets", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--task", default="semseg")
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 expert banks (serve/quantize.py)")
    ap.add_argument("--no_flash", action="store_true")
    ap.add_argument("--raw_uint8", action="store_true",
                    help="ship raw [0,255] uint8 pixels; normalize on "
                         "device (4x smaller request payload)")
    ap.add_argument("--postprocess", action="store_true",
                    help="on-device get_output (argmax/uint8): ships the "
                         "compact result instead of raw logits.  On the "
                         "axon relay the logits transfer dominates absolute "
                         "latency (~22 MB/request for semseg at ~12 MB/s); "
                         "without this flag use the numbers only for A/B")
    args = ap.parse_args()
    if args.no_flash:
        os.environ["M3VIT_FLASH_ATTN"] = "0"

    from __graft_entry__ import build_flagship
    from m3vit_tpu.serve import InferenceSession

    model, tasks = build_flagship(dtype=jnp.bfloat16, use_checkpointing=False)
    img = jnp.zeros((1, 512, 512, 3), jnp.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r}, img, train=False)
    )(jax.random.key(0))

    if args.int8:
        import dataclasses

        from m3vit_tpu.serve.quantize import quantize_expert_tree

        model = dataclasses.replace(
            model,
            backbone=dataclasses.replace(model.backbone,
                                         expert_weights_int8=True))
        variables = dict(variables) | {
            "params": quantize_expert_tree(variables["params"])}

    sess = InferenceSession(
        model, variables, tasks=[t.name for t in tasks],
        img_size=(512, 512), buckets=args.buckets,
        raw_uint8_input=args.raw_uint8,
    )
    t0 = time.perf_counter()
    sess.warmup(tasks=[args.task], postprocess=args.postprocess)
    warmup_s = time.perf_counter() - t0

    rng = np.random.RandomState(0)
    for b in args.buckets:
        if args.raw_uint8:
            images = rng.randint(0, 256, size=(b, 512, 512, 3),
                                 dtype=np.int64).astype(np.uint8)
        else:
            images = rng.randn(b, 512, 512, 3).astype(np.float32)
        # one throwaway to load weights into the executable path
        sess.predict(images, args.task, postprocess=args.postprocess)
        lats = []
        for _ in range(args.requests):
            t0 = time.perf_counter()
            out = sess.predict(images, args.task,
                               postprocess=args.postprocess)
            lats.append(time.perf_counter() - t0)
        lats_ms = np.array(lats) * 1e3
        print(json.dumps({
            "bucket": b,
            "p50_ms": round(float(np.percentile(lats_ms, 50)), 2),
            "p99_ms": round(float(np.percentile(lats_ms, 99)), 2),
            "imgs_per_sec": round(b / (np.median(lats)), 1),
        }))
    print(json.dumps({"warmup_compile_s": round(warmup_s, 1),
                      "compiled": [list(k) for k in sess.compiled_keys]}))


if __name__ == "__main__":
    main()
