"""Measure the MoE dispatch/combine row gathers vs the HBM streaming roof.

The step-time budget (PERF.md) attributes ~28 ms/step to the 120 dispatch
machinery gathers (`jnp.take` of [S, 384] bf16 rows, S = 33-41k).  The
question: does XLA's row gather leave bandwidth on the table at 768-byte
row granularity, i.e. is a custom Pallas DMA gather worth building?

Harness notes (hard-won, see CLAUDE.md):
  * Working sets <= ~128 MB stay VMEM-resident across fori_loop
    iterations on v5e — "HBM" microbenches at flagship sizes measure
    VMEM.  Everything here runs at SCALE x the flagship shapes so the
    buffers are HBM-resident, like in the real step (where dozens of
    activations are live).
  * Per-call overhead on the axon relay is ~26 ms on this host — iterate
    inside jit and amortize.
  * Outputs must be FULLY consumed (jnp.sum) or XLA dead-code-eliminates
    the op and you measure loop overhead.  The sum fuses with the gather
    (no output write), so all rows below are READ-side bandwidth — the
    random-access read is the part that can fall off the roof; writes are
    contiguous.

A per-row async-DMA Pallas gather prototype (ring of outstanding copies,
scalar-prefetched indices, flat [T*D] source for lane-aligned offsets)
was also tried: Mosaic rejects 1-row slices of (8,128)-tiled memrefs, and
the flat-source variant crashes the remote tpu_compile_helper (HTTP 500).
Even if it compiled, S per-row DMAs of 768 B each are DMA-issue-bound.
Verdict lives in PERF.md.

Usage: python scripts/bench_gather.py [--iters 30] [--scale 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

T0, D = 8201, 384         # flagship tokens (+1 fill row), embed dim
S0_DISP = 41088           # E=16 x capacity 2568
S0_COMB = 32800           # T*K = 8200*4


def bench(fn, x, idx, iters, read_gb):
    @jax.jit
    def run(x, idx):
        def body(i, acc):
            # rotate indices by the loop counter: new gather pattern each
            # iteration, nothing loop-invariant to hoist
            out = fn(x, (idx + i) % x.shape[0])
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(x, idx))  # compile + sync
    t0 = time.perf_counter()
    float(run(x, idx))
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, read_gb / ms * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--scale", type=int, default=8,
                    help="multiple of flagship shapes (8x puts the "
                         "combine source at 252 MB, HBM-resident)")
    args = ap.parse_args()
    t, s_disp, s_comb = T0 * args.scale, S0_DISP * args.scale, \
        S0_COMB * args.scale

    x = jax.random.normal(jax.random.key(0), (t, D), jnp.bfloat16)
    y = jax.random.normal(jax.random.key(0), (s_disp, D), jnp.bfloat16)
    idx_d = jax.random.randint(jax.random.key(1), (s_disp,), 0, t, jnp.int32)
    idx_c = jax.random.randint(jax.random.key(2), (s_comb,), 0, s_disp,
                               jnp.int32)

    gb_x = t * D * 2 / 1e9          # contiguous read of the disp source
    gb_y = s_disp * D * 2 / 1e9     # contiguous read of the comb source
    gb_d = s_disp * D * 2 / 1e9     # gathered-read bytes, dispatch
    gb_c = s_comb * D * 2 / 1e9     # gathered-read bytes, combine

    ms, bw = bench(lambda x, i: x * (1 + i[0]).astype(jnp.bfloat16),
                   x, idx_d, args.iters, gb_x)
    print(f"stream_read [{t}x{D}]    : {ms:7.3f} ms  {bw:7.1f} GB/s")
    ms, bw = bench(lambda y, i: y * (1 + i[0]).astype(jnp.bfloat16),
                   y, idx_c, args.iters, gb_y)
    print(f"stream_read [{s_disp}x{D}]   : {ms:7.3f} ms  {bw:7.1f} GB/s")
    ms, bw = bench(lambda x, i: jnp.take(x, i, axis=0, mode="fill",
                                         fill_value=0), x, idx_d,
                   args.iters, gb_d)
    print(f"take_disp   [{s_disp}<-{t}] : {ms:7.3f} ms  {bw:7.1f} GB/s")
    ms, bw = bench(lambda y, i: jnp.take(y, i, axis=0, mode="fill",
                                         fill_value=0), y, idx_c,
                   args.iters, gb_c)
    print(f"take_comb   [{s_comb}<-{s_disp}]: {ms:7.3f} ms  {bw:7.1f} GB/s")


if __name__ == "__main__":
    main()
