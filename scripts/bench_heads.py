"""Microbenchmark: 5 separate PUP-head conv stacks vs one grouped-conv pass.

The flagship profile shows the five task heads dominating step time as many
medium ops (conv_3 fwd/bwd at 256^2x256, BN-backward reduces, layout copies).
All five heads share conv shapes, so they can run as ONE conv with
feature_group_count=5 over stacked channels.  This measures fwd+bwd wall time
of both formulations in isolation (loop inside jit; grads fed back into the
carry so nothing hoists).

Usage: python scripts/bench_heads.py [--iters 10] [--batch 8]
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

T = 5  # tasks
CH = 256
EMBED = 384
NCLS = 21


def bn_relu(x, scale, bias):
    # batch-stats BN (training mode) in f32, output bf16 like the model
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(0, 1, 2))
    var = ((xf - mean) ** 2).mean(axis=(0, 1, 2))
    y = (xf - mean) * lax.rsqrt(var + 1e-5) * scale + bias
    return jax.nn.relu(y).astype(x.dtype)


def up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


def _up2_axis(x, axis):
    # 2x bilinear, half-pixel centers, edge clamp:
    #   out[2i]   = 0.25*in[i-1] + 0.75*in[i]
    #   out[2i+1] = 0.75*in[i]   + 0.25*in[i+1]
    lo = jnp.concatenate([lax.slice_in_dim(x, 0, 1, axis=axis),
                          lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
                         axis=axis)
    hi = jnp.concatenate([lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
                          lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                                           axis=axis)], axis=axis)
    even = 0.25 * lo + 0.75 * x
    odd = 0.75 * x + 0.25 * hi
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def up2_manual(x):
    return _up2_axis(_up2_axis(x, 1), 2)


def conv(x, w, groups=1):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def head_separate(x, params, up=up2):
    # x: [B, 32, 32, EMBED] bf16; one head
    for i in range(4):
        x = conv(x, params[f"w{i}"])
        x = bn_relu(x, params[f"s{i}"], params[f"b{i}"])
        if i < 3:
            x = up(x)
    x = conv(x, params["w4"])  # 1x1 -> NCLS
    return up(x.astype(jnp.float32))


def loss_separate(all_params, x):
    tot = 0.0
    for t in range(T):
        o = head_separate(x, all_params[t])
        tot = tot + (o * o).mean()
    return tot


def loss_separate_manualup(all_params, x):
    tot = 0.0
    for t in range(T):
        o = head_separate(x, all_params[t], up=up2_manual)
        tot = tot + (o * o).mean()
    return tot


def head_grouped(x, params):
    # x: [B, 32, 32, T*EMBED]; weights block-stacked along output channels
    for i in range(4):
        x = conv(x, params[f"w{i}"], groups=T)
        x = bn_relu(x, params[f"s{i}"], params[f"b{i}"])
        if i < 3:
            x = up2(x)
    x = conv(x, params["w4"], groups=T)
    return up2(x.astype(jnp.float32))


def loss_grouped(gparams, x):
    xg = jnp.concatenate([x] * T, axis=-1)
    o = head_grouped(xg, gparams)
    return (o * o).mean() * T  # same scale as sum of means (NCLS equal)


def make_params(key, dtype):
    ks = jax.random.split(key, 16)
    p = {}
    cin = EMBED
    for i in range(4):
        p[f"w{i}"] = (jax.random.normal(ks[i], (3, 3, cin, CH), jnp.float32)
                      * 0.02).astype(dtype)
        p[f"s{i}"] = jnp.ones((CH,), jnp.float32)
        p[f"b{i}"] = jnp.zeros((CH,), jnp.float32)
        cin = CH
    p["w4"] = (jax.random.normal(ks[5], (1, 1, CH, NCLS), jnp.float32)
               * 0.02).astype(dtype)
    return p


def group_params(plist):
    g = {}
    for i in range(4):
        # block-diagonal grouped weights: group t reads channels [t*cin:(t+1)*cin]
        g[f"w{i}"] = jnp.concatenate([p[f"w{i}"] for p in plist], axis=-1)
        g[f"s{i}"] = jnp.concatenate([p[f"s{i}"] for p in plist])
        g[f"b{i}"] = jnp.concatenate([p[f"b{i}"] for p in plist])
    g["w4"] = jnp.concatenate([p["w4"] for p in plist], axis=-1)
    return g


def bench(fn, params, x, iters, label):
    @jax.jit
    def run(params, x):
        def body(_, carry):
            p, x = carry
            l, (gp, gx) = jax.value_and_grad(fn, argnums=(0, 1))(p, x)
            # feed grads back so nothing is loop-invariant
            p = jax.tree.map(lambda a, g: a - 1e-6 * g.astype(a.dtype), p, gp)
            x = x - 1e-6 * gx.astype(x.dtype)
            return p, x
        return lax.fori_loop(0, iters, body, (params, x))

    out = run(params, x)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())  # sync
    t0 = time.perf_counter()
    out = run(params, x)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": label, "ms_per_iter": round(dt * 1e3, 2)}))
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    key = jax.random.key(0)
    dtype = jnp.bfloat16
    x = jax.random.normal(key, (args.batch, 32, 32, EMBED), jnp.float32).astype(dtype)
    plist = [make_params(jax.random.key(i), dtype) for i in range(T)]
    gparams = group_params(plist)

    # numerics check (small): grouped == sum of separates
    ls = loss_separate(plist, x)
    lg = loss_grouped(gparams, x)
    print(f"# loss separate={float(ls):.5f} grouped={float(lg):.5f}")

    r = jax.random.normal(jax.random.key(9), (2, 16, 16, 8), jnp.float32)
    d = jnp.abs(up2(r) - up2_manual(r)).max()
    print(f"# up2 manual-vs-jax.image max|diff| = {float(d):.2e}")

    bench(loss_separate, plist, x, args.iters, "separate5")
    bench(loss_separate_manualup, plist, x, args.iters, "separate5_manualup")


if __name__ == "__main__":
    main()
