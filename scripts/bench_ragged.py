"""Microbenchmark: padded [E,C,d] einsum expert FFN vs lax.ragged_dot.

At capacity factor 2.0 the padded layout computes 2x the routed slots; the
ragged formulation computes exactly S = T*K token-FFNs (the fastmoe ragged
semantic, no drops).  Measures fwd+bwd of w1 -> gelu -> w2.

Usage: python scripts/bench_ragged.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

E, S, D, HID = 16, 32800, 384, 768
CF = 2.0
C = int(CF * S / E + 7) // 8 * 8  # 4104

gelu = functools.partial(jax.nn.gelu, approximate=False)


def ffn_padded(h, w1, w2):
    # h: [E, C, d] bf16
    a = jnp.einsum("ecd,edh->ech", h, w1, preferred_element_type=jnp.float32)
    a = gelu(a).astype(h.dtype)
    o = jnp.einsum("ech,ehd->ecd", a, w2, preferred_element_type=jnp.float32)
    return o.astype(h.dtype)


def ffn_ragged(h, w1, w2, gs):
    # h: [S, d] bf16 sorted by expert; gs: [E] group sizes
    a = lax.ragged_dot(h, w1, gs, preferred_element_type=jnp.float32)
    a = gelu(a).astype(h.dtype)
    o = lax.ragged_dot(a, w2, gs, preferred_element_type=jnp.float32)
    return o.astype(h.dtype)


def bench(fn, args0, iters, label):
    @jax.jit
    def run(*args):
        def body(_, carry):
            def loss(*a):
                return (fn(*a).astype(jnp.float32) ** 2).mean()
            l, gs_ = jax.value_and_grad(loss, argnums=tuple(range(len(carry))))(
                *carry)
            return tuple(a - (1e-6 * g).astype(a.dtype)
                         for a, g in zip(carry, gs_))
        return lax.fori_loop(0, iters, body, args)

    diff_args = args0[:3] if fn is ffn_ragged else args0
    extra = args0[3:] if fn is ffn_ragged else ()

    @jax.jit
    def run2(diff, extra):
        def body(_, carry):
            def loss(*a):
                return (fn(*a, *extra).astype(jnp.float32) ** 2).mean()
            l, g = jax.value_and_grad(loss, argnums=tuple(range(len(carry))))(
                *carry)
            return tuple(a - (1e-6 * gg).astype(a.dtype)
                         for a, gg in zip(carry, g))
        return lax.fori_loop(0, iters, body, diff)

    out = run2(diff_args, extra)
    float(out[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    out = run2(diff_args, extra)
    float(out[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": label, "ms_per_iter": round(dt * 1e3, 3)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    w1 = (jax.random.normal(k1, (E, D, HID), jnp.float32) * 0.02).astype(jnp.bfloat16)
    w2 = (jax.random.normal(k2, (E, HID, D), jnp.float32) * 0.02).astype(jnp.bfloat16)
    hp = jax.random.normal(k3, (E, C, D), jnp.float32).astype(jnp.bfloat16)
    hr = jax.random.normal(k3, (S, D), jnp.float32).astype(jnp.bfloat16)
    gs = jnp.full((E,), S // E, jnp.int32)

    print(f"# padded slots {E*C} vs ragged {S}")
    bench(ffn_padded, (hp, w1, w2), args.iters, "padded_cf2")
    bench(ffn_ragged, (hr, w1, w2, gs), args.iters, "ragged")


if __name__ == "__main__":
    main()
