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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = np.sqrt(2.0).astype(np.float32)
_INV_SQRT_2PI = np.float32(1.0 / np.sqrt(2.0 * np.pi))


def pallas_expert_ffn_available() -> bool:
    return jax.default_backend() in ("tpu", "axon")


# Test hook: lets CPU tests exercise the fused dense-MLP path in Pallas
# interpret mode.  Production code never sets this — off-TPU the MlpBlock
# falls back to the nn.Dense path instead of silently running the
# interpreter (ADVICE r2).
_FORCE_INTERPRET_FOR_TESTS = False


def dense_mlp_fused_mode() -> Optional[str]:
    """How MlpBlock.use_pallas should execute: 'kernel' on TPU backends,
    'interpret' when the test hook is set, None = fall back to nn.Dense."""
    if pallas_expert_ffn_available():
        return "kernel"
    if _FORCE_INTERPRET_FOR_TESTS:
        return "interpret"
    return None


def fused_dense_mlp(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    interpret: bool = False,
    mesh=None,
    seq_axis: str = "seq",
) -> jnp.ndarray:
    """Tokenwise fused MLP on [B, N, C] via the expert kernel (E=1).

    Under GSPMD a top-level ``pallas_call`` cannot be partitioned — on a
    >1-device mesh XLA would fail or replicate the full token tensor per
    chip (ADVICE r2, models/vit.py finding).  The MLP is embarrassingly
    token-parallel, so on a multi-device mesh this opens a ``shard_map``
    region matching the surrounding program's activation sharding (batch
    over every non-seq axis, sequence over ``seq_axis``) with replicated
    weights; single-device meshes skip shard_map entirely.
    """
    B, N, _ = x.shape

    def local(xs):
        h = xs.reshape(1, -1, xs.shape[-1])
        out = fused_expert_ffn(
            h, w1[None], b1[None], w2[None], b2[None], interpret)
        return out.reshape(xs.shape)

    if mesh is None or mesh.size <= 1:
        return local(x)

    from jax.sharding import PartitionSpec as P

    batch_axes = tuple(
        a for a in mesh.axis_names if a != seq_axis and mesh.shape[a] > 1)
    seq_sharded = mesh.shape.get(seq_axis, 1) > 1
    nb = 1
    for a in batch_axes:
        nb *= mesh.shape[a]
    ns = mesh.shape.get(seq_axis, 1)
    if B % max(nb, 1) == 0 and N % ns == 0:
        x_spec = P(batch_axes or None, seq_axis if seq_sharded else None, None)
    else:
        # shapes indivisible by the mesh (unusual): run the kernel
        # replicated inside shard_map — still correct, never unpartitionable
        x_spec = P(None, None, None)
    w_spec = (P(None, None), P(None), P(None, None), P(None))

    def body(xs, w1s, b1s, w2s, b2s):
        h = xs.reshape(1, -1, xs.shape[-1])
        out = fused_expert_ffn(
            h, w1s[None], b1s[None], w2s[None], b2s[None], interpret)
        return out.reshape(xs.shape)

    return jax.shard_map(
        body, mesh=mesh, in_specs=(x_spec,) + w_spec, out_specs=x_spec,
        check_vma=False,
    )(x, w1, b1, w2, b2)


def _pick_block(c: int, preferred: int = 512) -> int:
    for b in (preferred, 256, 128, 64, 32, 16, 8):
        if c % b == 0:
            return b
    return c


def _pad_tokens(x: jnp.ndarray, mult: int = 256):
    """Pad the token axis of [E, C, ...] to a multiple of `mult`.

    Capacity is only 8-aligned (e.g. C=2568 at cf=1.25), whose largest
    aligned divisor is 8 — a 5000-step grid of [8, d] GEMMs.  Zero-padding
    ~10% of rows buys [256, d] blocks; padded rows produce zero gradients
    and are sliced off."""
    C = x.shape[1]
    pad = (-C) % mult
    if pad == 0:
        return x, C
    widths = [(0, 0)] * x.ndim
    widths[1] = (0, pad)
    return jnp.pad(x, widths), C


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
    h, C_orig = _pad_tokens(h)
    E, C, d = h.shape
    H = w1.shape[-1]
    bc = _pick_block(C)
    grid = (E, C // bc)
    # biases as [E, 1, F]: TPU block tiling needs the last two block dims to
    # match the array when not multiples of (8, 128)
    b1 = b1.reshape(E, 1, H)
    b2 = b2.reshape(E, 1, d)
    out = pl.pallas_call(
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
    return out[:, :C_orig]


def _gelu_and_grad(a_pre: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    a_pre = a_pre.astype(jnp.float32)
    cdf = 0.5 * (1.0 + jax.lax.erf(a_pre / _SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * a_pre * a_pre)
    return a_pre * cdf, cdf + a_pre * pdf


def _ffn_bwd_kernel(h_ref, w1_ref, b1_ref, w2_ref, g_ref,
                    dh_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    """One fused backward step: recompute a_pre/a on the MXU (remat), emit
    dh for this token block, accumulate dw1/db1/dw2/db2 in VMEM across the
    C-grid (their block index is constant in c, so the output block stays
    resident; @pl.when(c == 0) initializes it)."""
    c = pl.program_id(1)
    h = h_ref[0]           # [BC, d] bf16
    g = g_ref[0]           # [BC, d]
    w1 = w1_ref[0]         # [d, H]
    w2 = w2_ref[0]         # [H, d]
    cd = h.dtype

    a_pre = jnp.dot(h, w1, preferred_element_type=jnp.float32) \
        + b1_ref[0].astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf_approx(a_pre / _SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * a_pre * a_pre)
    a = (a_pre * cdf).astype(cd)
    dgelu = cdf + a_pre * pdf

    # every contraction via dot_general dimension numbers — materializing
    # .T inside the kernel is a VPU shuffle and dominated the kernel time
    def dotT_rhs(x, w):  # x [BC, k] · w [m, k] -> [BC, m]
        return jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dotT_lhs(x, y):  # x [BC, m] · y [BC, n] -> [m, n]
        return jax.lax.dot_general(
            x, y, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    gc = g.astype(cd)
    da_f = dotT_rhs(gc, w2) * dgelu
    da = da_f.astype(cd)

    dh_ref[0] = dotT_rhs(da, w1).astype(dh_ref.dtype)

    @pl.when(c == 0)
    def _init():
        dw1_ref[0] = jnp.zeros_like(dw1_ref[0])
        db1_ref[0] = jnp.zeros_like(db1_ref[0])
        dw2_ref[0] = jnp.zeros_like(dw2_ref[0])
        db2_ref[0] = jnp.zeros_like(db2_ref[0])

    dw1_ref[0] += dotT_lhs(h, da)
    db1_ref[0] += jnp.sum(da_f, axis=0, keepdims=True)
    dw2_ref[0] += dotT_lhs(a, gc)
    db2_ref[0] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)


def _ffn_backward(h, w1, b1, w2, g, *, interpret=False):
    h, C_orig = _pad_tokens(h)
    g, _ = _pad_tokens(g)
    E, C, d = h.shape
    H = w1.shape[-1]
    bc = _pick_block(C)
    grid = (E, C // bc)
    b1r = b1.reshape(E, 1, H)
    dh, dw1, db1, dw2, db2 = pl.pallas_call(
        _ffn_bwd_kernel,
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
            pl.BlockSpec((1, bc, d), lambda e, c: (e, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
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
        out_shape=[
            jax.ShapeDtypeStruct((E, C, d), h.dtype),
            jax.ShapeDtypeStruct((E, d, H), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((E, H, d), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * E * C * d * H,
            bytes_accessed=3 * E * C * d * h.dtype.itemsize
            + E * d * H * 4 * 2,
            transcendentals=E * C * H,
        ),
        interpret=interpret,
    )(h, w1, b1r, w2, g)
    return (dh[:, :C_orig], dw1, db1.reshape(E, H), dw2,
            db2.reshape(E, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_expert_ffn(h, w1, b1, w2, b2, interpret=False):
    """out = gelu_exact(h @ w1 + b1) @ w2 + b2, batched per expert (dim 0)."""
    return _ffn_forward(h, w1, b1, w2, b2, interpret=interpret)


def _fwd(h, w1, b1, w2, b2, interpret):
    out = _ffn_forward(h, w1, b1, w2, b2, interpret=interpret)
    return out, (h, w1, b1, w2, b2)


def _bwd(interpret, res, g):
    """Fused Pallas backward: one kernel recomputes a_pre/a in VMEM (remat)
    and emits dh plus all weight/bias grads — no [E, C, H] intermediate ever
    touches HBM (the einsum formulation materialized a_pre, dgelu, and da
    in f32 there)."""
    h, w1, b1, w2, b2 = res
    dh, dw1, db1, dw2, db2 = _ffn_backward(
        h, w1, b1, w2, g.astype(h.dtype), interpret=interpret)
    return (dh.astype(h.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


fused_expert_ffn.defvjp(_fwd, _bwd)


def _ffn_q_kernel(h_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                  out_ref):
    """Weight-only int8 variant: dequantize w1/w2 in VMEM (VPU convert +
    per-output-channel scale), then the same MXU GEMM pair — HBM reads the
    int8 weights (half the bf16 bytes), never a float copy."""
    h = h_ref[0]  # [BC, d]
    cd = h.dtype
    w1 = (w1_ref[0].astype(jnp.float32) * s1_ref[0].astype(jnp.float32)
          ).astype(cd)  # [d, H]
    a = jnp.dot(h, w1, preferred_element_type=jnp.float32)
    a = a + b1_ref[0].astype(jnp.float32)
    a = 0.5 * a * (1.0 + _erf_approx(a / _SQRT2))
    a = a.astype(cd)
    w2 = (w2_ref[0].astype(jnp.float32) * s2_ref[0].astype(jnp.float32)
          ).astype(cd)  # [H, d]
    o = jnp.dot(a, w2, preferred_element_type=jnp.float32)
    o = o + b2_ref[0].astype(jnp.float32)
    out_ref[0] = o.astype(out_ref.dtype)


def quantized_expert_ffn(h, qparams, *, interpret=False):
    """Inference-only fused expert FFN on int8 weights (no VJP defined).

    h: [E, C, d] compute-dtype; qparams: dispatch.MoEFfnParamsQ.
    """
    h, C_orig = _pad_tokens(h)
    E, C, d = h.shape
    H = qparams.w1.shape[-1]
    bc = _pick_block(C)
    grid = (E, C // bc)
    b1 = qparams.b1.reshape(E, 1, H)
    b2 = qparams.b2.reshape(E, 1, d)
    s1 = qparams.s1.reshape(E, 1, H).astype(jnp.float32)
    s2 = qparams.s2.reshape(E, 1, d).astype(jnp.float32)
    out = pl.pallas_call(
        _ffn_q_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bc, d), lambda e, c: (e, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, H), lambda e, c: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda e, c: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda e, c: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, d), lambda e, c: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda e, c: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda e, c: (e, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bc, d), lambda e, c: (e, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, C, d), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * E * C * d * H,
            bytes_accessed=E * C * d * 2 * 2 + E * d * H * 2,
            transcendentals=E * C * H,
        ),
        interpret=interpret,
    )(h, qparams.w1, s1, b1, qparams.w2, s2, b2)
    return out[:, :C_orig]


def make_pallas_ffn_fn(interpret: bool = False):
    """Adapter matching dispatch.expert_ffn_dense's signature (ffn_fn hook).

    Accepts float (MoEFfnParams) or int8 (MoEFfnParamsQ) expert weights;
    the int8 path is inference-only."""

    def ffn(h, params, activation=None, compute_dtype=jnp.bfloat16,
            dropout_rate=0.0, dropout_rng=None):
        assert dropout_rate == 0.0 or dropout_rng is None, (
            "pallas expert FFN does not fuse dropout; use the einsum path"
        )
        assert activation is None, (
            "pallas expert FFN hardcodes exact (Abramowitz-Stegun erf) GELU; "
            "route other activations through the einsum path"
        )
        cd = compute_dtype
        from m3vit_tpu.moe.dispatch import MoEFfnParamsQ

        if isinstance(params, MoEFfnParamsQ):
            return quantized_expert_ffn(h.astype(cd), params,
                                        interpret=interpret)
        return fused_expert_ffn(
            h.astype(cd), params.w1.astype(cd), params.b1, params.w2.astype(cd),
            params.b2, interpret,
        )

    return ffn
