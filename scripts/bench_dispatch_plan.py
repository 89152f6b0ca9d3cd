"""Microbench: make_dispatch_plan (2 sorts) vs single-sort reformulations.

The dispatch plan runs 30x/step (6 MoE blocks x 5 tasks) in the flagship.
The current implementation pays TWO bitonic sorts over S = T*K = 32.8k
elements (a 3-operand sort by expert id, then a 2-operand un-sort for the
inverse map).  Candidates measured here produce BITWISE-identical plans:

  v2_cumsum : rank-in-expert via one-hot cumsum (no sort), dst computed
              directly, then ONE sort on a packed int32 key dst*S+iota
              (unique -> stability free) carrying only the score payload.
  v2_matmul : same, but the rank cumsum is a two-level blocked prefix sum
              (a [128,128] lower-tri matmul per 128-slot block on the MXU
              + a tiny cross-block cumsum) instead of lax.cumsum's
              log-shift passes.

Usage: python scripts/bench_dispatch_plan.py [--iters 50] [--S 32800]
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
import numpy as np

from m3vit_tpu.moe.dispatch import DispatchPlan, make_dispatch_plan


def _rank_cumsum(flat_e: jnp.ndarray, E: int) -> jnp.ndarray:
    """0-based rank of each slot within its expert (slot order); -1 for
    masked ids >= E (their one-hot row is all zeros)."""
    oh = jax.nn.one_hot(flat_e, E, dtype=jnp.float32)  # [S, E]
    cum = jnp.cumsum(oh, axis=0)
    return ((cum * oh).sum(axis=-1) - 1.0).astype(jnp.int32)


def _rank_blocked(flat_e: jnp.ndarray, E: int, block: int = 256) -> jnp.ndarray:
    """Same rank via a blocked prefix sum: within-block inclusive cumsum as a
    lower-triangular matmul (MXU), plus an exclusive cumsum of block totals."""
    S = flat_e.shape[0]
    pad = (-S) % block
    fe = jnp.pad(flat_e, (0, pad), constant_values=E)
    oh = jax.nn.one_hot(fe, E, dtype=jnp.float32).reshape(-1, block, E)
    tri = jnp.tril(jnp.ones((block, block), jnp.float32))
    within = jnp.einsum("ij,bje->bie", tri, oh,
                        preferred_element_type=jnp.float32)
    totals = oh.sum(axis=1)  # [nB, E]
    offs = jnp.cumsum(totals, axis=0) - totals  # exclusive
    cum = within + offs[:, None, :]
    rank = (cum.reshape(-1, E) * oh.reshape(-1, E)).sum(-1) - 1.0
    return rank[:S].astype(jnp.int32)


def make_dispatch_plan_v2(
    flat_e: jnp.ndarray,
    num_experts: int,
    capacity: int,
    scores_flat=None,
    rank_fn=_rank_cumsum,
) -> DispatchPlan:
    S = flat_e.shape[0]
    E, C = num_experts, capacity
    flat_e = flat_e.astype(jnp.int32)
    iota = jnp.arange(S, dtype=jnp.int32)
    if scores_flat is None:
        scores_flat = jnp.zeros((S,), jnp.float32)

    rank = rank_fn(flat_e, E)
    keep = (rank < C) & (flat_e < E) & (rank >= 0)
    dst = jnp.where(keep, flat_e * C + rank, E * C)

    assert (E * C + 1) * S < 2**31, "packed key would overflow int32"
    key = dst * S + iota
    sorted_key, sorted_w = jax.lax.sort(
        (key, scores_flat.astype(jnp.float32)), num_keys=1, is_stable=False)
    order = sorted_key % S  # iota payload recovered from the unique key

    bounds = (jnp.arange(E, dtype=jnp.int32) * C) * S
    starts = jnp.searchsorted(sorted_key, bounds, side="left").astype(jnp.int32)
    end = jnp.searchsorted(sorted_key, jnp.int32(E * C * S),
                           side="left").astype(jnp.int32)
    counts = jnp.concatenate([starts[1:], end[None]]) - starts  # [E], <= C

    order_pad = jnp.concatenate([order, jnp.full((C,), S, jnp.int32)])
    w_pad = jnp.concatenate([sorted_w, jnp.zeros((C,), jnp.float32)])
    src2d = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(order_pad, s, C))(starts)
    w2d = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(w_pad, s, C))(starts)
    valid = jnp.arange(C, dtype=jnp.int32)[None, :] < counts[:, None]
    src_flat = jnp.where(valid, src2d, S).reshape(-1)
    w_slot = jnp.where(valid, w2d, 0.0).reshape(-1)
    return DispatchPlan(src_flat=src_flat, w_slot=w_slot, dst=dst)


def check_equality(S=4096, E=16, K=4, cf=1.25, seed=0):
    rng = np.random.default_rng(seed)
    T = S // K
    C = int(cf * T * K / E) + 1
    for trial in range(4):
        e = rng.integers(0, E + (2 if trial == 3 else 0), size=(S,)).astype(np.int32)
        w = rng.random(S).astype(np.float32)
        p1 = make_dispatch_plan(jnp.asarray(e), E, C, jnp.asarray(w))
        for name, rf in (("cumsum", _rank_cumsum), ("matmul", _rank_blocked)):
            p2 = make_dispatch_plan_v2(jnp.asarray(e), E, C, jnp.asarray(w),
                                       rank_fn=rf)
            for f in DispatchPlan._fields:
                a, b = np.asarray(getattr(p1, f)), np.asarray(getattr(p2, f))
                assert np.array_equal(a, b), (name, f, trial)
    print("equality: OK (incl. masked ids >= E)")


def bench(fn, S, E, C, iters):
    @jax.jit
    def run(seed):
        def body(i, carry):
            seed, acc = carry
            k = jax.random.fold_in(jax.random.PRNGKey(0), seed + i + acc)
            e = jax.random.randint(k, (S,), 0, E, dtype=jnp.int32)
            w = jax.random.uniform(k, (S,), jnp.float32)
            plan = fn(e, E, C, w)
            # feed an output back into the carry so nothing hoists
            return seed, plan.dst[0] + plan.src_flat[0]
        _, acc = jax.lax.fori_loop(0, iters, body, (seed, jnp.int32(0)))
        return acc

    float(run(jnp.int32(1)))  # compile
    t0 = time.perf_counter()
    float(run(jnp.int32(2)))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--S", type=int, default=32800)
    ap.add_argument("--E", type=int, default=16)
    ap.add_argument("--cf", type=float, default=1.25)
    ap.add_argument("--K", type=int, default=4)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    check_equality()

    T = args.S // args.K
    C = ((int(args.cf * args.S / args.E) + 1 + 7) // 8) * 8
    print(f"S={args.S} E={args.E} C={C} backend={jax.default_backend()}")
    for name, fn in (
        ("v1 (2 sorts)", make_dispatch_plan),
        ("v2 cumsum+1sort", functools.partial(make_dispatch_plan_v2,
                                              rank_fn=_rank_cumsum)),
        ("v2 matmul+1sort", functools.partial(make_dispatch_plan_v2,
                                              rank_fn=_rank_blocked)),
    ):
        ms = bench(fn, args.S, args.E, C, args.iters)
        print(f"  {name:>18}: {ms:7.3f} ms/plan")


if __name__ == "__main__":
    main()
