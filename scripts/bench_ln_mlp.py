"""A/B the fused LN+MLP+residual kernel vs the unfused dense-block site.

PERF.md attributes ~25 ms/step to the "LayerNorm / residual / gate tail":
bandwidth-bound fusions around the pallas_call fusion barriers.  Each
dense-block MLP site currently runs

  LN (XLA fusion: read x, write h) -> fused_dense_mlp kernel (read h,
  write o) -> residual add (read x + o, write x')

= ~44 MB of HBM traffic at the flagship [8200, 384] bf16 shape, where the
fully-fused kernel (ops/ln_mlp.py) needs only read-x/write-x' (~12.6 MB).
This measures the per-site fwd+bwd time of both compositions at flagship
scale so the expected ~26-site win can be judged before plumbing the
opt-in through the model.

Harness rules (CLAUDE.md): loop inside jit (fori_loop); dx feeds the next
iteration's x so nothing is loop-invariant or dead; sync via float().

Usage: python scripts/bench_ln_mlp.py [--iters 30] [--S 8200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from m3vit_tpu.ops.expert_ffn import fused_expert_ffn
from m3vit_tpu.ops.ln_mlp import fused_ln_mlp_residual

EPS = 1e-6


def unfused_site(x, gamma, beta, w1, b1, w2, b2):
    """The current dense-block composition: f32 LN (XLA) + fused MLP kernel
    + bf16 residual add (models/vit.py DenseBlock)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = (xc * jax.lax.rsqrt(var + EPS) * gamma + beta).astype(x.dtype)
    o = fused_expert_ffn(h[None], w1[None], b1[None], w2[None], b2[None],
                         False)[0]
    return x + o.astype(x.dtype)


def fused_site(x, gamma, beta, w1, b1, w2, b2):
    return fused_ln_mlp_residual(x, gamma, beta, w1, b1, w2, b2, EPS, False)


def bench(site_fn, x, params, iters, fwd_only=False):
    gamma, beta, w1, b1, w2, b2 = params

    def loss(x):
        out = site_fn(x, gamma, beta, w1, b1, w2, b2)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad = jax.grad(loss)

    @jax.jit
    def run(x0):
        def body(_, carry):
            x, acc = carry
            if fwd_only:
                out = site_fn(x, gamma, beta, w1, b1, w2, b2)
                # feed the full output back in; keep magnitudes bounded
                nx = (0.5 * x.astype(jnp.float32)
                      + 1e-3 * out.astype(jnp.float32)).astype(x.dtype)
                return nx, acc + jnp.sum(out.astype(jnp.float32))
            dx = grad(x)
            nx = (x + 1e-6 * dx).astype(x.dtype)
            return nx, acc + jnp.sum(dx.astype(jnp.float32))

        x, acc = jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0)))
        return acc + jnp.sum(x.astype(jnp.float32))

    v = run(x)  # compile + warm
    float(v)
    t0 = time.perf_counter()
    v = run(x)
    float(v)
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--S", type=int, default=8200)  # B=8 x N=1025 flagship
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--H", type=int, default=1536)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    cd = jnp.bfloat16
    x = jnp.asarray(rng.randn(args.S, args.d).astype(np.float32) * 0.1,
                    dtype=cd)
    params = (
        jnp.asarray(1.0 + 0.1 * rng.randn(args.d).astype(np.float32)),
        jnp.asarray(0.1 * rng.randn(args.d).astype(np.float32)),
        jnp.asarray(rng.randn(args.d, args.H).astype(np.float32) * 0.05,
                    dtype=cd),
        jnp.asarray(rng.randn(args.H).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(args.H, args.d).astype(np.float32) * 0.05,
                    dtype=cd),
        jnp.asarray(rng.randn(args.d).astype(np.float32) * 0.05),
    )

    # correctness spot-check at bench shape before timing
    a = unfused_site(x, *params)
    b = fused_site(x, *params)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                b.astype(jnp.float32))))
    print(f"max |unfused - fused| = {err:.3e}")

    for fwd_only, tag in ((False, "fwd+bwd"), (True, "fwd-only")):
        t_unfused = bench(unfused_site, x, params, args.iters, fwd_only)
        t_fused = bench(fused_site, x, params, args.iters, fwd_only)
        print(f"[{tag}] unfused LN + MLP kernel + residual : "
              f"{t_unfused:8.3f} ms/site")
        print(f"[{tag}] fused ln_mlp kernel                : "
              f"{t_fused:8.3f} ms/site")
        print(f"[{tag}] delta: {t_unfused - t_fused:+.3f} ms/site; "
              f"x{t_unfused / t_fused:.2f}")


if __name__ == "__main__":
    main()
