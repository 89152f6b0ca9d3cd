"""Measure achievable HBM streaming bandwidth vs working-set size.

The gather verdict (scripts/bench_gather.py, PERF.md) needs an honest
roofline.  Harness hazard (now fixed): if the loop body's output is only
consumed at one element, XLA dead-code-eliminates the full-array op and
you measure loop overhead.  Here each iteration's FULL output is the next
iteration's input (x = x * c + 1, c varies per step), and the final value
is fully reduced — nothing can be narrowed or hoisted.

Usage: python scripts/bench_hbm_roof.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def bench(nrows, d=384, iters=100):
    x = jax.random.normal(jax.random.key(0), (nrows, d), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(i, x):
            c = jnp.bfloat16(1.0) + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
            return x * c + jnp.bfloat16(1e-8)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x)
                       .astype(jnp.float32))

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    ms = (time.perf_counter() - t0) / iters * 1e3
    gb = nrows * d * 2 * 2 / 1e9  # read + write per iteration
    print(f"rows={nrows:>8d}  {gb*1e3:8.1f} MB rt  {ms:8.3f} ms  "
          f"{gb/ms*1e3:7.1f} GB/s")
    return gb, ms


def main():
    for nrows in (8192, 41088, 164352, 657408, 2629632):
        bench(nrows)


if __name__ == "__main__":
    main()
