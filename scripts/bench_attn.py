"""Microbenchmark: naive softmax attention vs Pallas TPU flash attention.

Flagship shapes: B=8, H=6, N=1025 (512^2/16^2 + cls), head_dim=64, bf16.
The naive path materializes [B,H,N,N] f32/bf16 score tensors in HBM each
fwd+bwd; flash keeps tiles in VMEM.  N=1025 is padded to 1152 (9x128) with
segment-id masking: real tokens segment 1, pads segment 2 (pads attend only
to pads, so no all-masked softmax rows; padded outputs are sliced off).

Usage: python scripts/bench_attn.py [--iters 30]
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

B, H, N, D = 8, 6, 1025, 64
SCALE = D ** -0.5


def naive_attn(q, k, v):
    # q,k,v: [B, N, H, D] bf16 (the model's layout, vit.py Attention)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * SCALE
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


def flash_attn(q, k, v, bq=128, bk=128):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, BlockSizes, SegmentIds)

    npad = (N + 127) // 128 * 128  # 1152
    pad = npad - N

    def to_bhnd(x):
        x = jnp.swapaxes(x, 1, 2)  # [B, H, N, D]
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    qp, kp, vp = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    seg = jnp.concatenate([jnp.ones((B, N), jnp.int32),
                           jnp.full((B, pad), 2, jnp.int32)], axis=1)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    o = flash_attention(qp, kp, vp, segment_ids=SegmentIds(seg, seg),
                        sm_scale=SCALE, block_sizes=bs)
    return jnp.swapaxes(o[:, :, :N, :], 1, 2)  # back to [B, N, H, D]


def attn_block_midsplit(x, wqkv, wproj):
    # the model's current formulation: reshape to [B,N,3,H,D], index dim 2
    B_, N_, C = x.shape
    qkv = (x @ wqkv).reshape(B_, N_, 3, H, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    o = naive_attn(q, k, v).reshape(B_, N_, C)
    return o @ wproj


def attn_block_lastsplit(x, wqkv, wproj):
    # identical math: contiguous last-dim slices instead of mid-dim indexing
    B_, N_, C = x.shape
    qkv = x @ wqkv
    q = qkv[..., :C].reshape(B_, N_, H, D)
    k = qkv[..., C:2 * C].reshape(B_, N_, H, D)
    v = qkv[..., 2 * C:].reshape(B_, N_, H, D)
    o = naive_attn(q, k, v).reshape(B_, N_, C)
    return o @ wproj


def bench_block(fn, iters, label):
    C = H * D
    key = jax.random.key(0)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (B, N, C), jnp.float32).astype(jnp.bfloat16)
    wqkv = (jax.random.normal(ks[1], (C, 3 * C), jnp.float32) * 0.05).astype(
        jnp.bfloat16)
    wproj = (jax.random.normal(ks[2], (C, C), jnp.float32) * 0.05).astype(
        jnp.bfloat16)

    @jax.jit
    def run(x, wqkv, wproj):
        def body(_, carry):
            x, wqkv, wproj = carry

            def loss(x, wqkv, wproj):
                return (fn(x, wqkv, wproj).astype(jnp.float32) ** 2).mean()

            l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, wqkv, wproj)
            return tuple(a - (1e-6 * gg).astype(a.dtype)
                         for a, gg in zip(carry, g))

        return lax.fori_loop(0, iters, body, (x, wqkv, wproj))

    out = run(x, wqkv, wproj)
    float(out[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    out = run(x, wqkv, wproj)
    float(out[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": label, "ms_per_iter": round(dt * 1e3, 3)}))


def bench(fn, iters, label):
    @jax.jit
    def run(q, k, v):
        def body(_, carry):
            q, k, v = carry

            def loss(q, k, v):
                return (fn(q, k, v).astype(jnp.float32) ** 2).mean()

            l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
            return tuple(a - (1e-6 * gg).astype(a.dtype)
                         for a, gg in zip(carry, g))

        return lax.fori_loop(0, iters, body, (q, k, v))

    key = jax.random.key(0)
    ks = jax.random.split(key, 3)
    q, k, v = (jax.random.normal(kk, (B, N, H, D), jnp.float32).astype(
        jnp.bfloat16) for kk in ks)
    out = run(q, k, v)
    float(out[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    out = run(q, k, v)
    float(out[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": label, "ms_per_iter": round(dt * 1e3, 3)}))


def check():
    key = jax.random.key(1)
    ks = jax.random.split(key, 3)
    q, k, v = (jax.random.normal(kk, (B, N, H, D), jnp.float32).astype(
        jnp.bfloat16) for kk in ks)
    a = naive_attn(q, k, v).astype(jnp.float32)
    b = flash_attn(q, k, v).astype(jnp.float32)
    print(f"# fwd max|diff| = {float(jnp.abs(a - b).max()):.2e}")

    def loss(fn, q, k, v):
        return (fn(q, k, v).astype(jnp.float32) ** 2).mean()

    ga = jax.grad(functools.partial(loss, naive_attn), argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(functools.partial(loss, flash_attn), argnums=(0, 1, 2))(q, k, v)
    for i, (x, y) in enumerate(zip(ga, gb)):
        d = jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)).max()
        print(f"# grad[{'qkv'[i]}] max|diff| = {float(d):.2e}")


def attn_block_ours(x, wqkv, wproj):
    # the shipped kernel: fused qkv-layout Pallas flash
    # (m3vit_tpu/ops/flash_attention.py) — no q/k/v splits at all
    from m3vit_tpu.ops.flash_attention import flash_attention_qkv

    qkv = x @ wqkv
    return flash_attention_qkv(qkv, H, SCALE) @ wproj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    check()
    bench_block(attn_block_midsplit, args.iters, "block_midsplit")
    bench_block(attn_block_lastsplit, args.iters, "block_lastsplit")
    bench_block(attn_block_ours, args.iters, "block_pallas_flash")


if __name__ == "__main__":
    main()
