"""Head conv backward-filter: can the 0.83 ms layout rotation be avoided?
(round-4 VERDICT next #5 — the last characterized-but-unattempted copy cost)

The flagship profile shows five ~0.83 ms bf16[256,8,256,256] layout
rotations feeding the PUP heads' filter-grad convolutions (XLA transposes
NHWC activations to channel-major before its conv-backward-filter, then
runs the conv at MXU peak ~3.2 ms; PERF.md copies row).  Candidate: express
dW directly as 9 shifted tall-skinny GEMMs over NHWC —
    dW[kh,kw,ci,co] = sum_{b,y,x} in[b, y+kh-1, x+kw-1, ci] * cot[b,y,x,co]
i.e. per (kh,kw): A^T B with A = shifted input [B*H*W, Ci], B = cotangent
[B*H*W, Co] — the contraction runs over the MAJOR dims of both NHWC
tensors, so no layout rotation is needed.

Measures, at the exact site shape (in [8,256,256,256] bf16, cot same,
k=3x3, SAME padding), inside one jit with a fori_loop (relay RPC overhead
otherwise dominates — CLAUDE.md):
  a. XLA native: jax.grad of conv_general_dilated wrt the filter
  b. 9-shifted-GEMM formulation (einsum, f32 accumulation)
and checks b == a to f32 tolerance.

Prints one JSON line per variant.  Verdict goes to PERF.md (win -> wire a
custom filter-grad into the head convs; loss -> reject row, copies
category closed).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def conv_fwd(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def native_filter_grad(x, cot):
    """dW via jax.grad of the conv (what the train step does today: bf16
    cotangents into the conv transpose rule, like the bf16 train graph)."""
    def f(w):
        return (conv_fwd(x, w) * cot).astype(jnp.float32).sum()

    return jax.grad(f)(jnp.zeros((3, 3, x.shape[-1], cot.shape[-1]),
                                 x.dtype))


def shifted_gemm_filter_grad(x, cot):
    """dW as 9 shifted A^T B GEMMs over NHWC (no layout rotation)."""
    B, H, W, Ci = x.shape
    Co = cot.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = []
    for kh in range(3):
        cols = []
        for kw in range(3):
            a = jax.lax.dynamic_slice(
                xp, (0, kh, kw, 0), (B, H, W, Ci))
            # contraction over the MAJOR b,h,w dims of both NHWC tensors
            g = jnp.einsum(
                "bhwc,bhwk->ck", a, cot,
                preferred_element_type=jnp.float32)
            cols.append(g)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # [3,3,Ci,Co]


def timed(fn, x, cot, iters):
    @jax.jit
    def loop(x, cot):
        def body(i, carry):
            # feed the result back so XLA cannot hoist the op (CLAUDE.md)
            acc, x = carry
            g = fn(x, cot)
            acc = acc + g.astype(jnp.float32)
            x = x + acc[0, 0, :, 0].mean().astype(x.dtype) * 0
            return acc, x

        acc = jnp.zeros((3, 3, x.shape[-1], cot.shape[-1]), jnp.float32)
        acc, _ = jax.lax.fori_loop(0, iters, body, (acc, x))
        return acc

    r = loop(x, cot)
    float(r[0, 0, 0, 0])  # compile + sync
    t0 = time.perf_counter()
    r = loop(x, cot)
    float(r[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    return dt, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--ch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    kx, kc = jax.random.split(jax.random.key(0))
    x = jax.random.normal(
        kx, (args.b, args.hw, args.hw, args.ch), jnp.float32
    ).astype(jnp.bfloat16)
    cot = jax.random.normal(
        kc, (args.b, args.hw, args.hw, args.ch), jnp.float32
    ).astype(jnp.bfloat16)

    t_nat, r_nat = timed(native_filter_grad, x, cot, args.iters)
    print(json.dumps({"variant": "xla_native_filter_grad",
                      "ms": round(t_nat * 1e3, 3)}), flush=True)

    t_gemm, r_gemm = timed(shifted_gemm_filter_grad, x, cot, args.iters)
    print(json.dumps({"variant": "shifted_gemm_filter_grad",
                      "ms": round(t_gemm * 1e3, 3)}), flush=True)

    import numpy as np

    a = np.asarray(r_nat, np.float32)
    b = np.asarray(r_gemm, np.float32)
    rel = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))
    print(json.dumps({
        "check_max_rel_err": round(rel, 6),
        "speedup": round(t_nat / t_gemm, 3),
        "verdict": "WIN" if t_gemm < t_nat * 0.95 and rel < 1e-2
        else "REJECT",
    }), flush=True)


if __name__ == "__main__":
    main()
