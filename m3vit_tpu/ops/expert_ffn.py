"""Pallas TPU kernel: fused per-expert FFN  out = gelu(h @ w1 + b1) @ w2 + b2.

The FMoELinear-pair equivalent (reference: fastmoe's cublas grouped GEMM,
custom_moe_layer.py:32-44) as one fused kernel: both GEMMs hit the MXU and
the GELU runs on the VPU without materializing the [E, C, H] hidden
activation in HBM — the main HBM-traffic saving over two separate einsums.

Layouts: h [E, C, d], w1 [E, d, H], b1 [E, H], w2 [E, H, d], b2 [E, d].
Grid (E, C/BLOCK_C); per step the kernel holds one expert's weights and one
token block in VMEM.  Forward is the Pallas kernel; backward is a custom VJP
with einsum-based grads (recomputing the hidden activation, remat-style).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = np.sqrt(2.0).astype(np.float32)
_INV_SQRT_2PI = np.float32(1.0 / np.sqrt(2.0 * np.pi))


def pallas_expert_ffn_available() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _pick_block(c: int, preferred: int = 512) -> int:
    for b in (preferred, 256, 128, 64, 32, 16, 8):
        if c % b == 0:
            return b
    return c


def _erf_approx(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7); Pallas TPU has
    no erf lowering."""
    sign = jnp.sign(x)
    x = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-x * x))


def _ffn_kernel(h_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    h = h_ref[0]  # [BC, d]
    w1 = w1_ref[0]  # [d, H]
    a = jnp.dot(h, w1, preferred_element_type=jnp.float32)
    a = a + b1_ref[0].astype(jnp.float32)  # b1 block [1, 1, H] -> [1, H]
    # exact-formulation (erf) gelu on the VPU
    a = 0.5 * a * (1.0 + _erf_approx(a / _SQRT2))
    a = a.astype(w2_ref.dtype)
    o = jnp.dot(a, w2_ref[0], preferred_element_type=jnp.float32)
    o = o + b2_ref[0].astype(jnp.float32)
    out_ref[0] = o.astype(out_ref.dtype)


def _ffn_forward(h, w1, b1, w2, b2, *, interpret=False):
    E, C, d = h.shape
    H = w1.shape[-1]
    bc = _pick_block(C)
    grid = (E, C // bc)
    # biases as [E, 1, F]: TPU block tiling needs the last two block dims to
    # match the array when not multiples of (8, 128)
    b1 = b1.reshape(E, 1, H)
    b2 = b2.reshape(E, 1, d)
    return pl.pallas_call(
        _ffn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bc, d), lambda e, c: (e, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, H), lambda e, c: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda e, c: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, d), lambda e, c: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda e, c: (e, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bc, d), lambda e, c: (e, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, C, d), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * E * C * d * H,
            bytes_accessed=(E * C * d * 2 + E * d * H * 2 * 2) * h.dtype.itemsize,
            transcendentals=E * C * H,
        ),
        interpret=interpret,
    )(h, w1, b1, w2, b2)


def _gelu_and_grad(a_pre: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    a_pre = a_pre.astype(jnp.float32)
    cdf = 0.5 * (1.0 + jax.lax.erf(a_pre / _SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * a_pre * a_pre)
    return a_pre * cdf, cdf + a_pre * pdf


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_expert_ffn(h, w1, b1, w2, b2, interpret=False):
    """out = gelu_exact(h @ w1 + b1) @ w2 + b2, batched per expert (dim 0)."""
    return _ffn_forward(h, w1, b1, w2, b2, interpret=interpret)


def _fwd(h, w1, b1, w2, b2, interpret):
    out = _ffn_forward(h, w1, b1, w2, b2, interpret=interpret)
    return out, (h, w1, b1, w2, b2)


def _bwd(interpret, res, g):
    h, w1, b1, w2, b2 = res
    cd = w1.dtype
    g = g.astype(jnp.float32)
    # recompute hidden pre-activation (remat)
    a_pre = jnp.einsum("ecd,edh->ech", h.astype(cd), w1,
                       preferred_element_type=jnp.float32) \
        + b1.astype(jnp.float32)[:, None, :]
    a, dgelu = _gelu_and_grad(a_pre)
    dw2 = jnp.einsum("ech,ecd->ehd", a.astype(cd), g.astype(cd),
                     preferred_element_type=jnp.float32)
    db2 = g.sum(axis=1)
    da = jnp.einsum("ecd,ehd->ech", g.astype(cd), w2,
                    preferred_element_type=jnp.float32) * dgelu
    dw1 = jnp.einsum("ecd,ech->edh", h.astype(cd), da.astype(cd),
                     preferred_element_type=jnp.float32)
    db1 = da.sum(axis=1)
    dh = jnp.einsum("ech,edh->ecd", da.astype(cd), w1,
                    preferred_element_type=jnp.float32)
    return (dh.astype(h.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


fused_expert_ffn.defvjp(_fwd, _bwd)


def make_pallas_ffn_fn(interpret: bool = False):
    """Adapter matching dispatch.expert_ffn_dense's signature (ffn_fn hook)."""

    def ffn(h, params, activation=None, compute_dtype=jnp.bfloat16,
            dropout_rate=0.0, dropout_rng=None):
        assert dropout_rate == 0.0 or dropout_rng is None, (
            "pallas expert FFN does not fuse dropout; use the einsum path"
        )
        cd = compute_dtype
        return fused_expert_ffn(
            h.astype(cd), params.w1.astype(cd), params.b1, params.w2.astype(cd),
            params.b2, interpret,
        ).astype(jnp.float32)

    return ffn
