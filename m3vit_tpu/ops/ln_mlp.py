"""Pallas TPU kernel: fused  out = x + MLP(LayerNorm(x))  for dense blocks.

Motivation (PERF.md "LayerNorm / residual / gate tail"): a ``pallas_call``
is an XLA fusion barrier, so the current dense-block MLP site materializes
the token tensor to HBM three extra times per forward —

    LN fusion:    read x, write h
    MLP kernel:   read h, write o
    residual add: read x, read o, write x'

(~44 MB of HBM traffic per site at the flagship [8200, 384] bf16 shape).
Folding the LayerNorm into the kernel prologue and the residual add into
its epilogue reduces that to ``read x, write x'`` (~12.6 MB).  The LN row
statistics are recomputed in VMEM (d=384 fits a tile row; two VPU
reductions), remat-style, in both forward and backward — nothing extra is
saved to HBM.

Numerics match the unfused path (f32 LayerNorm + the ops/expert_ffn kernel
+ bf16 residual add) to bf16 rounding: LN stats and the GEMM accumulations
are f32, the MLP output is rounded to the stream dtype before the residual
add, exactly like the unfused composition.

Reference analogue: models/backbones/vit_moe.py Block.forward
(norm2 -> Mlp -> residual); the fusion itself has no reference counterpart
(torch eager materializes every intermediate).

Opt-in (``use_pallas_ln_mlp``); only legal when drop-path and dropout are
inactive at the site — callers keep the unfused path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m3vit_tpu.ops.expert_ffn import (
    _INV_SQRT_2PI,
    _SQRT2,
    _erf_approx,
    _pick_block,
)


def fused_dense_ln_mlp(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    eps: float = 1e-6,
    interpret: bool = False,
    mesh=None,
    seq_axis: str = "seq",
) -> jnp.ndarray:
    """x + MLP(LN(x)) on [B, N, C] tokens.

    Same GSPMD treatment as ops/expert_ffn.fused_dense_mlp: a top-level
    pallas_call is unpartitionable on a >1-device mesh, and the site is
    embarrassingly token-parallel — so multi-device meshes run it inside
    shard_map (batch over non-seq axes, sequence over ``seq_axis``) with
    replicated weights; single-device meshes skip shard_map."""
    B, N, _ = x.shape

    def local(xs):
        flat = xs.reshape(-1, xs.shape[-1])
        out = fused_ln_mlp_residual(flat, gamma, beta, w1, b1, w2, b2, eps,
                                    interpret)
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
        x_spec = P(None, None, None)
    w_specs = (P(None), P(None), P(None, None), P(None), P(None, None),
               P(None))

    def body(xs, gs, bs, w1s, b1s, w2s, b2s):
        flat = xs.reshape(-1, xs.shape[-1])
        out = fused_ln_mlp_residual(flat, gs, bs, w1s, b1s, w2s, b2s, eps,
                                    interpret)
        return out.reshape(xs.shape)

    return jax.shard_map(
        body, mesh=mesh, in_specs=(x_spec,) + w_specs, out_specs=x_spec,
        check_vma=False,
    )(x, gamma, beta, w1, b1, w2, b2)


def _pad_rows(x: jnp.ndarray, mult: int = 256):
    """Pad the leading (token) axis of [S, d] to a multiple of ``mult``."""
    S = x.shape[0]
    pad = (-S) % mult
    if pad == 0:
        return x, S
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths), S


def _ln_rows(xf: jnp.ndarray, gamma, beta, eps: float):
    """f32 LayerNorm over the last axis of a [BC, d] tile; returns
    (h_pre, xhat, rstd) — all f32."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    return xhat * gamma + beta, xhat, rstd


def _fwd_kernel(eps, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref):
    xf = x_ref[...].astype(jnp.float32)          # [BC, d]
    gamma = g_ref[...].astype(jnp.float32)       # [1, d]
    beta = b_ref[...].astype(jnp.float32)
    h_pre, _, _ = _ln_rows(xf, gamma, beta, eps)
    h = h_pre.astype(w1_ref.dtype)
    a = jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32)
    a = a + b1_ref[...].astype(jnp.float32)
    a = 0.5 * a * (1.0 + _erf_approx(a / _SQRT2))
    a = a.astype(w2_ref.dtype)
    o = jnp.dot(a, w2_ref[...], preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    # round the MLP output to the stream dtype BEFORE the residual add —
    # bitwise-matches the unfused kernel-out + bf16 residual composition
    o = o.astype(out_ref.dtype).astype(jnp.float32)
    out_ref[...] = (xf + o).astype(out_ref.dtype)


def _ln_mlp_forward(x, gamma, beta, w1, b1, w2, b2, eps, *, interpret=False):
    x, S_orig = _pad_rows(x)
    S, d = x.shape
    H = w1.shape[-1]
    bs = _pick_block(S)
    grid = (S // bs,)
    g2 = gamma.reshape(1, d)
    be2 = beta.reshape(1, d)
    b1r = b1.reshape(1, H)
    b2r = b2.reshape(1, d)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bs, d), lambda s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, H), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bs, d), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * S * d * H,
            bytes_accessed=2 * S * d * x.dtype.itemsize + d * H * 2 * 2,
            transcendentals=S * H,
        ),
        interpret=interpret,
    )(x, g2, be2, w1, b1r, w2, b2r)
    return out[:S_orig]


def _bwd_kernel(eps, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, gr_ref,
                dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    """Recompute LN + hidden activations in VMEM (remat), emit dx for this
    token block, accumulate dgamma/dbeta/dw1/db1/dw2/db2 across the grid
    (their block index is constant in s; @pl.when(s == 0) initializes)."""
    s = pl.program_id(0)
    xf = x_ref[...].astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)
    beta = b_ref[...].astype(jnp.float32)
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    gr = gr_ref[...]                              # [BC, d] stream-dtype grad
    cd = w1.dtype

    h_pre, xhat, rstd = _ln_rows(xf, gamma, beta, eps)
    h = h_pre.astype(cd)
    a_pre = jnp.dot(h, w1, preferred_element_type=jnp.float32) \
        + b1_ref[...].astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf_approx(a_pre / _SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * a_pre * a_pre)
    a = (a_pre * cdf).astype(cd)
    dgelu = cdf + a_pre * pdf

    def dotT_rhs(x, w):  # x [BC, k] · w [m, k] -> [BC, m]
        return jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    def dotT_lhs(x, y):  # x [BC, m] · y [BC, n] -> [m, n]
        return jax.lax.dot_general(
            x, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    gc = gr.astype(cd)
    da_f = dotT_rhs(gc, w2) * dgelu
    da = da_f.astype(cd)
    dh = dotT_rhs(da, w1)                         # [BC, d] f32

    # LayerNorm backward (per-row): dx_ln = rstd*(dhg - mean(dhg)
    #                                              - xhat*mean(dhg*xhat))
    dhg = dh * gamma
    m1 = jnp.mean(dhg, axis=-1, keepdims=True)
    m2 = jnp.mean(dhg * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dhg - m1 - xhat * m2)

    dx_ref[...] = (gr.astype(jnp.float32) + dx_ln).astype(dx_ref.dtype)

    @pl.when(s == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref[...])
        db_ref[...] = jnp.zeros_like(db_ref[...])
        dw1_ref[...] = jnp.zeros_like(dw1_ref[...])
        db1_ref[...] = jnp.zeros_like(db1_ref[...])
        dw2_ref[...] = jnp.zeros_like(dw2_ref[...])
        db2_ref[...] = jnp.zeros_like(db2_ref[...])

    dg_ref[...] += jnp.sum(dh * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dw1_ref[...] += dotT_lhs(h, da)
    db1_ref[...] += jnp.sum(da_f, axis=0, keepdims=True)
    dw2_ref[...] += dotT_lhs(a, gc)
    db2_ref[...] += jnp.sum(gr.astype(jnp.float32), axis=0, keepdims=True)


def _ln_mlp_backward(x, gamma, beta, w1, b1, w2, gr, eps, *, interpret=False):
    x, S_orig = _pad_rows(x)
    gr, _ = _pad_rows(gr)
    S, d = x.shape
    H = w1.shape[-1]
    # the backward holds ~5 f32 [bs, H] intermediates; halve the forward
    # block to stay inside the ~16 MB scoped-VMEM budget (cf. flash bwd)
    bs = _pick_block(S, preferred=256)
    grid = (S // bs,)
    g2 = gamma.reshape(1, d)
    be2 = beta.reshape(1, d)
    b1r = b1.reshape(1, H)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bs, d), lambda s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, H), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, d), lambda s: (s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bs, d), lambda s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, H), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * S * d * H,
            bytes_accessed=3 * S * d * x.dtype.itemsize + d * H * 4 * 2,
            transcendentals=S * H,
        ),
        interpret=interpret,
    )(x, g2, be2, w1, b1r, w2, gr)
    dx, dg, db, dw1, db1, dw2, db2 = outs
    return (dx[:S_orig], dg.reshape(d), db.reshape(d), dw1,
            db1.reshape(H), dw2, db2.reshape(d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_ln_mlp_residual(x, gamma, beta, w1, b1, w2, b2, eps=1e-6,
                          interpret=False):
    """out = x + (gelu_exact(LN(x; gamma, beta) @ w1 + b1) @ w2 + b2).

    x: [S, d] stream dtype (bf16 on the flagship); weights compute-dtype;
    gamma/beta/b* f32.  Residual and LN math in f32, rounded like the
    unfused path.
    """
    return _ln_mlp_forward(x, gamma, beta, w1, b1, w2, b2, eps,
                           interpret=interpret)


def _vjp_fwd(x, gamma, beta, w1, b1, w2, b2, eps, interpret):
    out = _ln_mlp_forward(x, gamma, beta, w1, b1, w2, b2, eps,
                          interpret=interpret)
    # b2 itself is not needed by the backward, only its dtype (so every
    # cotangent is cast to its primal's dtype, ADVICE r3); it's [d]-tiny
    return out, (x, gamma, beta, w1, b1, w2, b2)


def _vjp_bwd(eps, interpret, res, gr):
    x, gamma, beta, w1, b1, w2, b2 = res
    dx, dg, db, dw1, db1, dw2, db2 = _ln_mlp_backward(
        x, gamma, beta, w1, b1, w2, gr.astype(x.dtype), eps,
        interpret=interpret)
    return (dx.astype(x.dtype), dg.astype(gamma.dtype), db.astype(beta.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype), dw2.astype(w2.dtype),
            db2.astype(b2.dtype))


fused_ln_mlp_residual.defvjp(_vjp_fwd, _vjp_bwd)
