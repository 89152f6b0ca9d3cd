"""Sweep the flash-attention q-tile size fwd+bwd at the flagship shape.

Token padding is fixed at ceil(N/128)*128 (1025 -> 1152); the q tile only
sets how many rows each grid step processes.  Bigger tiles amortize
per-tile overheads and keep the MXU pipelined (measured v5e: 1.91 ms/iter
at 128 -> 1.60 at the fwd-1152/bwd-576 auto-pick); the ceiling is the
~16 MB scoped VMEM, which the auto-pick (bq=0) respects per direction.

Usage: python scripts/bench_flash_bq.py [--iters 30] [--bqs 0,128,384,576]
       (bq=0 = the shipped auto-pick policy)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

B, N, H, D = 8, 1025, 6, 64
C = H * D
SCALE = D ** -0.5


def bench(iters: int, bq: int) -> float:
    import m3vit_tpu.ops.flash_attention as fa

    # read at trace time by _pick_bq; bq=0 means the auto-pick policy
    fa._BQ_FWD = bq or None
    fa._BQ_BWD = bq or None

    key = jax.random.key(0)
    qkv = jax.random.normal(key, (B, N, 3 * C), jnp.bfloat16)

    @jax.jit
    def run(qkv):
        def body(_, carry):
            def loss(z):
                o = fa.flash_attention_qkv(z, H, SCALE)
                return (o.astype(jnp.float32) ** 2).sum()

            g = jax.grad(loss)(carry)
            return 0.9 * carry + 0.1 * g  # feed output back: no hoisting

        return jax.lax.fori_loop(0, iters, body, qkv)

    out = run(qkv)
    float(out.sum())  # sync (block_until_ready unreliable on axon)
    t0 = time.perf_counter()
    out = run(qkv)
    float(out.sum())
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--bqs", default="128,256,512")
    args = ap.parse_args()
    for bq in (int(x) for x in args.bqs.split(",")):
        ms = bench(args.iters, bq)
        print(f"BQ={bq}: fwd+bwd {ms:.3f} ms/iter")


if __name__ == "__main__":
    main()
