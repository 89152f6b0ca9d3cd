"""Microbenchmark: training-mode BatchNorm+ReLU fwd+bwd formulations on TPU.

The flagship profile shows BN statistic/backward reduces over [8,256,256,256]
running at ~42 GB/s effective (~3.2 ms each) — far off HBM bandwidth.  This
compares:
  reduce : plain jnp reduces (what flax nn.BatchNorm lowers to)
  dot    : custom_vjp where every N-axis reduction (fwd stats, dbeta/dgamma,
           the two dx correction terms) is a ones-vector einsum -> MXU dot

Usage: python scripts/bench_bn.py [--iters 20]
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

B, H, W, C = 8, 256, 256, 256
EPS = 1e-5


def bn_relu_reduce(x, gamma, beta):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(0, 1, 2))
    var = ((xf - mean) ** 2).mean(axis=(0, 1, 2))
    y = (xf - mean) * lax.rsqrt(var + EPS) * gamma + beta
    return jax.nn.relu(y).astype(x.dtype)


# --- dot-reduce formulation -------------------------------------------------


def _colsum(v):  # [N, C] -> [C] as an MXU dot (f32 accumulate)
    ones = jnp.ones((v.shape[0],), v.dtype)
    return jnp.einsum("n,nc->c", ones, v, preferred_element_type=jnp.float32)


@jax.custom_vjp
def bn_relu_dot(x, gamma, beta):
    y, _ = _bn_relu_dot_fwd_impl(x, gamma, beta)
    return y


def _bn_relu_dot_fwd_impl(x, gamma, beta):
    n = x.shape[0] * x.shape[1] * x.shape[2]
    xr = x.reshape(n, x.shape[-1])
    s = _colsum(xr)
    s2 = _colsum((xr.astype(jnp.float32) * xr.astype(jnp.float32)).astype(x.dtype))
    mean = s / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = lax.rsqrt(var + EPS)
    a = (gamma * inv).astype(x.dtype)            # [C]
    b = (beta - gamma * inv * mean).astype(jnp.float32)
    y = jax.nn.relu(xr.astype(jnp.float32) * a.astype(jnp.float32) + b)
    y = y.astype(x.dtype).reshape(x.shape)
    return y, (xr, mean, inv)


def _bn_relu_dot_fwd(x, gamma, beta):
    y, res = _bn_relu_dot_fwd_impl(x, gamma, beta)
    return y, (res, gamma, beta, x.shape)


def _bn_relu_dot_bwd(packed, g):
    (xr, mean, inv), gamma, beta, xshape = packed
    n, c = xr.shape
    gr = g.reshape(n, c).astype(xr.dtype)
    xf = xr.astype(jnp.float32)
    xhat = (xf - mean) * inv
    pre = xhat * gamma + beta
    mask = (pre > 0).astype(xr.dtype)
    dy = (gr.astype(jnp.float32) * mask.astype(jnp.float32)).astype(xr.dtype)
    dbeta = _colsum(dy)
    dgamma = _colsum((dy.astype(jnp.float32) * xhat).astype(xr.dtype))
    t = (dbeta / n + xhat * (dgamma / n)).astype(jnp.float32)
    dx = ((dy.astype(jnp.float32) - t) * (gamma * inv)).astype(xr.dtype)
    return dx.reshape(xshape), dgamma, dbeta


bn_relu_dot.defvjp(_bn_relu_dot_fwd, _bn_relu_dot_bwd)


def bench(fn, label, iters):
    @jax.jit
    def run(x, gamma, beta):
        def body(_, carry):
            x, gamma, beta = carry

            def loss(x, gamma, beta):
                y = fn(x, gamma, beta)
                return (y.astype(jnp.float32) ** 2).mean()

            l, (gx, gg, gb) = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                x, gamma, beta)
            return (x - (1e-6 * gx).astype(x.dtype), gamma - 1e-6 * gg,
                    beta - 1e-6 * gb)

        return lax.fori_loop(0, iters, body, (x, gamma, beta))

    key = jax.random.key(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.float32).astype(jnp.bfloat16)
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32) + 0.1
    out = run(x, gamma, beta)
    float(out[1].sum())
    t0 = time.perf_counter()
    out = run(x, gamma, beta)
    float(out[1].sum())
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": label, "ms_per_iter": round(dt * 1e3, 3)}))


def check():
    key = jax.random.key(1)
    x = jax.random.normal(key, (2, 8, 8, 16), jnp.float32).astype(jnp.bfloat16)
    gamma = jnp.linspace(0.5, 1.5, 16)
    beta = jnp.linspace(-0.2, 0.2, 16)

    def loss(fn, x, gamma, beta):
        return (fn(x, gamma, beta).astype(jnp.float32) ** 2).mean()

    la, ga = jax.value_and_grad(functools.partial(loss, bn_relu_reduce),
                                argnums=(0, 1, 2))(x, gamma, beta)
    lb, gb = jax.value_and_grad(functools.partial(loss, bn_relu_dot),
                                argnums=(0, 1, 2))(x, gamma, beta)
    print(f"# loss {float(la):.6f} vs {float(lb):.6f}")
    for i, (a, b) in enumerate(zip(ga, gb)):
        d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()
        print(f"# grad[{i}] max|diff| = {float(d):.2e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    check()
    bench(bn_relu_reduce, "reduce", args.iters)
    bench(bn_relu_dot, "dot", args.iters)


if __name__ == "__main__":
    main()
