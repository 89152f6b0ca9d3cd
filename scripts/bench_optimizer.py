"""Size the optimizer-tail prize: per-leaf SGD update vs flattened.

PERF.md attributes ~10 ms/step to "optimizer + small-param epilogues" —
latency-bound fusions over hundreds of tiny [256]/[384] LN/bias/BN
parameters.  Question: how much would flattening the small params into
one buffer save?  Compares, on the REAL flagship param tree:

  1. per-leaf  : optax sgd+momentum+wd applied leaf-by-leaf (the step's
                 current form)
  2. flat-all  : optax.flatten(tx) — one ravel_pytree vector (breaks EP
                 sharding of expert momentum; measurement only)
  3. flat-small: big leaves (>= 128 KB) per-leaf + all small leaves in
                 one concatenated vector (shardable: small leaves are
                 replicated LN/bias/BN params)

Harness rules (CLAUDE.md): loop inside jit; outputs feed the next
iteration (params carry); full consumption via final reduce; the ~240 MB
param tree is HBM-resident.

Usage: python scripts/bench_optimizer.py [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

SMALL = 128 * 1024  # bytes; LN scales/biases, qkv biases, BN stats


def flatten_small(tx: optax.GradientTransformation,
                  small_bytes: int = SMALL) -> optax.GradientTransformation:
    """Apply tx with every leaf smaller than small_bytes concatenated into
    ONE flat vector (single fused update kernel instead of hundreds of
    latency-bound tiny ones).  Large leaves keep their own layout, so
    expert/qkv momentum shards exactly as before."""

    def is_small(x):
        return x.size * x.dtype.itemsize < small_bytes

    def split(tree):
        leaves, treedef = jax.tree.flatten(tree)
        mask = [is_small(x) for x in leaves]
        big = [x for x, m in zip(leaves, mask) if not m]
        small = [x for x, m in zip(leaves, mask) if m]
        flat = (jnp.concatenate([x.ravel() for x in small])
                if small else jnp.zeros((0,), jnp.float32))
        return {"big": big, "small_flat": flat}, (treedef, mask, small)

    def unsplit(split_tree, spec, like_small):
        treedef, mask, _ = spec
        big = iter(split_tree["big"])
        flat = split_tree["small_flat"]
        out, off = [], 0
        small_it = iter(like_small)
        for m in mask:
            if m:
                ref = next(small_it)
                out.append(flat[off:off + ref.size].reshape(ref.shape)
                           .astype(ref.dtype))
                off += ref.size
            else:
                out.append(next(big))
        return jax.tree.unflatten(treedef, out)

    def init(params):
        sp, spec = split(params)
        return tx.init(sp), spec[2]  # keep small-leaf templates

    def update(grads, state, params=None):
        inner_state, templates = state
        gs, gspec = split(grads)
        ps, _ = split(params) if params is not None else (None, None)
        updates, inner_state = tx.update(gs, inner_state, ps)
        return unsplit(updates, gspec, templates), (inner_state, templates)

    return optax.GradientTransformation(init, update)


def bench(label, tx, params, grads, iters):
    state = jax.jit(tx.init)(params)

    @jax.jit
    def run(params, state, grads):
        def body(i, carry):
            params, state = carry
            # scale grads by the counter so nothing is loop-invariant
            g = jax.tree.map(lambda g: g * (1.0 + i * 1e-9), grads)
            updates, state = tx.update(g, state, params)
            return optax.apply_updates(params, updates), state

        params, state = jax.lax.fori_loop(0, iters, body, (params, state))
        return params, state, sum(
            jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(params))

    _, _, s = run(params, state, grads)
    float(s)
    t0 = time.perf_counter()
    _, _, s = run(params, state, grads)
    float(s)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:12s}: {ms:7.3f} ms/update")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from __graft_entry__ import build_flagship
    from m3vit_tpu.data.synthetic import synthetic_batch

    model, tasks = build_flagship(dtype=jnp.bfloat16, use_checkpointing=False)
    batch = synthetic_batch(jax.random.key(0), tasks, 1, (512, 512))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(1)}, batch["image"], train=False)
    params = variables["params"]
    grads = jax.tree.map(lambda x: x * 1e-3, params)
    leaves = jax.tree.leaves(params)
    n_small = sum(1 for l in leaves if l.size * l.dtype.itemsize < SMALL)
    print(f"{len(leaves)} leaves, {n_small} small (<{SMALL//1024} KB), "
          f"{sum(l.size for l in leaves)/1e6:.1f}M params")

    def make_tx():
        return optax.chain(optax.add_decayed_weights(1e-4),
                           optax.sgd(0.002, momentum=0.9))

    bench("per-leaf", make_tx(), params, grads, args.iters)
    bench("flat-all", optax.flatten(make_tx()), params, grads, args.iters)
    bench("flat-small", flatten_small(make_tx()), params, grads, args.iters)


if __name__ == "__main__":
    main()
