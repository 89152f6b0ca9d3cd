"""Probe the PUP-head conv+BN+ReLU chain in isolation on the TPU.

The flagship xplane shows BN stats fusions (convert_reduce_fusion) over
[8,256,256,256] taking ~3.2 ms each — ~42 GB/s effective vs the ~620 GB/s
streaming roof.  This compiles ONE head's train fwd+bwd at flagship shape,
dumps the optimized HLO (to inspect what those fusions actually read), and
times the step with a non-VMEM-resident working set (5 heads chained, like
the real step).

Usage: python scripts/bench_head_bn.py [--iters 10] [--hlo /tmp/head_hlo.txt]
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
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--hlo", default="/tmp/head_hlo.txt")
    ap.add_argument("--profile", default=None,
                    help="optional xplane output dir")
    args = ap.parse_args()

    from m3vit_tpu.models.heads import VisionTransformerUpHead

    head = VisionTransformerUpHead(
        img_size=(512, 512), patch_size=16, embed_dim=384, num_classes=21,
        num_conv=4, num_upsample_layer=4, conv3x3_conv1x1=True,
        dtype=jnp.bfloat16,
    )
    x = jax.random.normal(jax.random.key(0), (8, 1025, 384),
                          jnp.float32).astype(jnp.bfloat16)
    v = head.init(jax.random.key(1), x, train=True)
    params, bstats = v["params"], v["batch_stats"]

    def loss(params, bstats, x):
        y, updates = head.apply(
            {"params": params, "batch_stats": bstats}, x, train=True,
            mutable=["batch_stats"])
        return (y.astype(jnp.float32) ** 2).mean(), updates["batch_stats"]

    grad_fn = jax.value_and_grad(loss, has_aux=True)

    @jax.jit
    def step(params, bstats, xs):
        # 5 independent inputs (like the 5 task heads) chained through the
        # loop so nothing stays VMEM-resident
        def body(i, carry):
            params, bstats, xs = carry
            x = lax.dynamic_index_in_dim(xs, i % 5, axis=0, keepdims=False)
            (l, bstats), g = grad_fn(params, bstats, x)
            params = jax.tree.map(
                lambda p, gg: p - (1e-6 * gg).astype(p.dtype), params, g)
            xs = lax.dynamic_update_index_in_dim(
                xs, x * (1.0 - 1e-6 * l).astype(x.dtype), i % 5, axis=0)
            return params, bstats, xs
        return lax.fori_loop(0, args.iters, body, (params, bstats, xs))

    xs = jnp.stack([x + i for i in range(5)])
    lowered = step.lower(params, bstats, xs)
    compiled = lowered.compile()
    with open(args.hlo, "w") as f:
        f.write(compiled.as_text())
    print(f"# optimized HLO -> {args.hlo}")

    out = compiled(params, bstats, xs)
    float(jax.tree.leaves(out[0])[0].sum())
    t0 = time.perf_counter()
    out = compiled(params, bstats, xs)
    float(jax.tree.leaves(out[0])[0].sum())
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"head_fwd_bwd_ms": round(dt * 1e3, 3)}))

    if args.profile:
        os.makedirs(args.profile, exist_ok=True)
        with jax.profiler.trace(args.profile):
            out = compiled(params, bstats, xs)
            float(jax.tree.leaves(out[0])[0].sum())
        print(f"# xplane -> {args.profile}")


if __name__ == "__main__":
    main()
