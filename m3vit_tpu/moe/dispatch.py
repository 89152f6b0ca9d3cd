"""TPU-native MoE dispatch / expert-FFN / combine.

This replaces the reference's fastmoe CUDA path
(`_fmoe_general_global_forward`: local radix-sort scatter -> NCCL all-to-all
-> grouped GEMMs -> all-to-all -> gather; reference:
models/moe/ckpt/custom_moe_layer.py:263-265) with an XLA-friendly design:

  * static-capacity token buckets per expert ([E, C, d]) — all shapes static
  * a sort-derived *dispatch plan* (src/dst index vectors) computed once per
    layer: stable argsort by expert id + vectorized searchsorted for the
    per-expert group starts (no bincount scatter-adds)
  * dispatch AND combine as pure row GATHERS with custom VJPs whose backward
    passes are also gathers.  Because src and dst are inverse permutations
    (plus capacity drops), no TPU scatter is ever needed for the token data —
    scatters serialize row-by-row on TPU (~86 GB/s measured) while gathers
    stream near memory bandwidth.  This mirrors fastmoe's hand-written
    MOEScatter/MOEGather autograd pair, but with both directions expressed as
    the cheap operation.
  * expert FFN as batched per-expert GEMMs on the MXU (einsum or the Pallas
    fused kernel in m3vit_tpu.ops.expert_ffn)
  * expert parallelism: the same buffers exchanged with jax.lax.all_to_all
    over the 'expert' mesh axis inside shard_map (ICI collective)

Capacity semantics: the reference never drops tokens (ragged dispatch).  We
use a static capacity C = ceil(cf * T * K / E) per (source shard, expert);
tokens beyond C for one expert are dropped (their combine weight contributes
nothing).  With cf >= E/K * (max expert share) the result is bit-exact with
the ragged reference; tests use a capacity large enough to guarantee no drop.
Routing slots whose expert id is >= E (used by the token variant to mask
non-compute tokens) are dropped before they occupy capacity.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


class MoEFfnParams(NamedTuple):
    """Per-expert two-layer MLP weights, expert-major layout.

    w1: [E, d_model, d_hidden]   (reference FMoELinear htoh4)
    b1: [E, d_hidden]
    w2: [E, d_hidden, d_model]   (reference FMoELinear h4toh)
    b2: [E, d_model]
    """

    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray


class MoEFfnParamsQ(NamedTuple):
    """Weight-only int8-quantized expert weights (serving path).

    w1/w2 are int8 with symmetric per-(expert, output-channel) scales
    s1 [E, d_hidden] / s2 [E, d_model] (f32):  w = w_q * s.  Biases stay
    float.  Inference-only — no VJP is defined for the quantized kernels.
    """

    w1: jnp.ndarray  # [E, d_model, d_hidden] int8
    b1: jnp.ndarray
    w2: jnp.ndarray  # [E, d_hidden, d_model] int8
    b2: jnp.ndarray
    s1: jnp.ndarray  # [E, d_hidden] f32
    s2: jnp.ndarray  # [E, d_model] f32


def dequantize_ffn_params(q: "MoEFfnParamsQ", dtype) -> MoEFfnParams:
    """Materialize float expert weights from an int8 pack (XLA fallback
    path; the Pallas q-kernel dequantizes in VMEM instead)."""
    return MoEFfnParams(
        w1=(q.w1.astype(jnp.float32) * q.s1[:, None, :]).astype(dtype),
        b1=q.b1,
        w2=(q.w2.astype(jnp.float32) * q.s2[:, None, :]).astype(dtype),
        b2=q.b2,
    )


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


#: Sentinel capacity factor: provably-no-drop dispatch.  top-k indices are
#: distinct per token, so one expert can receive at most `num_tokens` slots
#: from one source shard; capacity == num_tokens therefore NEVER drops —
#: the static-shape equivalent of fastmoe's ragged no-drop semantics
#: (reference ckpt/custom_moe_layer.py:263-265).  Accepted anywhere a
#: capacity factor is (YAML value `nodrop`, CLI `--moe_*capacity_factor
#: nodrop`).
NO_DROP = float("inf")


def compute_capacity(
    num_tokens: int, top_k: int, num_experts: int, capacity_factor: float
) -> int:
    """Static per-(source-shard, expert) capacity, rounded for TPU tiling.

    `capacity_factor=NO_DROP` (inf) gives the smallest capacity that can
    never drop a token (= num_tokens, see NO_DROP).  Finite factors are
    clamped to that same bound — capacity beyond it is pure HBM waste.
    """
    if capacity_factor != capacity_factor or capacity_factor == NO_DROP:
        return max(8, round_up(num_tokens, 8))
    c = int(capacity_factor * num_tokens * top_k / num_experts) + 1
    c = min(c, num_tokens)
    return max(8, round_up(c, 8))


def parse_capacity_factor(value) -> float:
    """Parse a capacity factor from config/CLI: a number, or 'nodrop'."""
    if isinstance(value, str):
        v = value.strip().lower()
        if v in ("nodrop", "no_drop", "inf"):
            return NO_DROP
        return float(v)
    return float(value)


def position_in_expert(flat_experts: jnp.ndarray, num_experts: int) -> jnp.ndarray:
    """Rank of each routing slot within its expert, in slot order.

    flat_experts: [S] int32 in [0, E). Returns [S] int32 positions (0-based).
    """
    S = flat_experts.shape[0]
    order = jnp.argsort(flat_experts, stable=True)
    counts = jnp.bincount(flat_experts, length=num_experts)
    starts = jnp.cumsum(counts) - counts
    rank_sorted = jnp.arange(S, dtype=jnp.int32) - starts[flat_experts[order]]
    inv = jnp.argsort(order, stable=True)
    return rank_sorted[inv].astype(jnp.int32)


class DispatchPlan(NamedTuple):
    """Index vectors tying token slots to expert-buffer slots.

    src_flat: [E*C] s32 — flat routing slot (t*K+k) feeding each expert slot;
              S when the expert slot is empty (OOB sentinel).
    w_slot:   [E*C] f32 — gate weight of the routing slot feeding each expert
              slot (0 when empty); carried through the sort so the combine
              backward never gathers scalars.
    dst:      [S]  s32 — expert-buffer slot (e*C + rank) for each routing
              slot; E*C when the slot was dropped (over capacity or masked).
    """

    src_flat: jnp.ndarray
    w_slot: jnp.ndarray
    dst: jnp.ndarray


def make_dispatch_plan(
    flat_e: jnp.ndarray,
    num_experts: int,
    capacity: int,
    scores_flat: Optional[jnp.ndarray] = None,
) -> DispatchPlan:
    """Build src/dst from the per-slot expert ids with ONE stable sort.

    TPU cost model drives every choice here:
      * group starts via vectorized searchsorted, not bincount (whose
        scatter-add of 1s serializes: ~0.3 ms per [16]-output fusion)
      * per-expert slot sources are CONTIGUOUS runs of the sorted order, so
        they come from E dynamic slices (vmap) rather than a [E*C] scalar
        gather (~0.44 ms each: TPU gathers of width-1 rows are element-serial)
      * scalar payloads (gate scores) ride through lax.sort as extra operands
        for the same reason.
    Expert ids >= num_experts are treated as dropped.
    """
    S = flat_e.shape[0]
    E, C = num_experts, capacity
    flat_e = flat_e.astype(jnp.int32)
    iota = jnp.arange(S, dtype=jnp.int32)

    if scores_flat is None:
        scores_flat = jnp.zeros((S,), jnp.float32)
    sorted_e, order, sorted_w = jax.lax.sort(
        (flat_e, iota, scores_flat.astype(jnp.float32)),
        num_keys=1, is_stable=True,
    )
    # starts[e] = first sorted index with id >= e; starts[E] excludes masked
    starts = jnp.searchsorted(
        sorted_e, jnp.arange(E + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]  # [E]

    # expert slot (e, c) <- sorted position starts[e] + c: a contiguous run
    order_pad = jnp.concatenate([order, jnp.full((C,), S, jnp.int32)])
    w_pad = jnp.concatenate([sorted_w, jnp.zeros((C,), jnp.float32)])
    src2d = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(order_pad, s, C)
    )(starts[:E])  # [E, C]
    w2d = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(w_pad, s, C)
    )(starts[:E])
    valid = jnp.arange(C, dtype=jnp.int32)[None, :] < jnp.minimum(counts, C)[:, None]
    src_flat = jnp.where(valid, src2d, S).reshape(-1)
    w_slot = jnp.where(valid, w2d, 0.0).reshape(-1)

    # routing slot -> expert slot (inverse map).  `order` is a permutation,
    # so un-sorting is another sort with dst_sorted as payload — TPU scalar
    # scatters serialize element-by-element (~0.28 ms at S=32.8k) while the
    # bitonic sort runs ~4x faster.
    rank_sorted = iota - jnp.take(starts, jnp.minimum(sorted_e, E), axis=0)
    keep = (rank_sorted < C) & (sorted_e < E)
    dst_sorted = jnp.where(keep, sorted_e * C + rank_sorted, E * C)
    _, dst = jax.lax.sort((order, dst_sorted), num_keys=1, is_stable=True)
    return DispatchPlan(src_flat=src_flat, w_slot=w_slot, dst=dst)


# ---------------------------------------------------------------------------
# dispatch / combine as gather pairs (custom VJP: backward is also a gather)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _dispatch_gather(x: jnp.ndarray, src_tok: jnp.ndarray, dst: jnp.ndarray):
    """h[slot] = x[src_tok[slot]] (0 for empty slots). x: [T, d] -> [E*C, d].

    Equivalent of fastmoe MOEScatter (custom_moe_layer.py:14); the VJP
    gathers the slot cotangents back through dst, the transpose exchange of
    MOEGather — no scatter touches the [*, d] data in either direction.
    """
    return jnp.take(x, src_tok, axis=0, mode="fill", fill_value=0)


def _dispatch_gather_fwd(x, src_tok, dst):
    return _dispatch_gather(x, src_tok, dst), (dst, jnp.zeros((x.shape[0], 0),
                                                             x.dtype))


def _dispatch_gather_bwd(res, g):
    dst, x_proto = res
    T = x_proto.shape[0]
    K = dst.shape[0] // T
    gk = jnp.take(g, dst.reshape(T, K), axis=0, mode="fill", fill_value=0)
    return gk.sum(axis=1, dtype=jnp.float32).astype(x_proto.dtype), None, None


_dispatch_gather.defvjp(_dispatch_gather_fwd, _dispatch_gather_bwd)


@jax.custom_vjp
def _combine_gather(
    y: jnp.ndarray,  # [E*C, d] expert outputs
    scores: jnp.ndarray,  # [T, K] gate probs (f32)
    dst: jnp.ndarray,  # [S] expert slot per routing slot
    src_tok: jnp.ndarray,  # [E*C] token id per expert slot (T when empty)
    w_slot: jnp.ndarray,  # [E*C] gate weight per expert slot (0 when empty)
):
    """out[t] = sum_k scores[t,k] * y[dst[t,k]] (reference bmm combine,
    custom_moe_layer.py:298-305); dropped slots contribute 0.  Accumulation
    in scores.dtype (f32).  w_slot must equal scores.reshape(-1)[src] per
    expert slot — precomputed by make_dispatch_plan so the backward is pure
    row gathers."""
    T, K = scores.shape
    ys = jnp.take(y, dst, axis=0, mode="fill", fill_value=0)
    # keep the gather at y's dtype: without the barrier XLA hoists the f32
    # convert ABOVE the gather, materializing the whole [E*C, d] expert
    # buffer in f32 and streaming the gather at twice the bytes (measured
    # +~10 ms/step on the token variant's stacked dispatch)
    ys = jax.lax.optimization_barrier(ys).reshape(T, K, -1)
    return (scores[..., None] * ys.astype(scores.dtype)).sum(axis=1)


def _combine_gather_fwd(y, scores, dst, src_tok, w_slot):
    return (_combine_gather(y, scores, dst, src_tok, w_slot),
            (y, scores, dst, src_tok, w_slot))


def _combine_gather_bwd(res, g):  # g: [T, d] f32
    y, scores, dst, src_tok, w_slot = res
    # all [*, d]-sized backward traffic runs at the expert-output dtype
    # (bf16 in mixed precision) with f32 accumulation on the reduces —
    # otherwise XLA materializes f32 [S, d] broadcast/gather buffers
    gc = g.astype(y.dtype)
    # grad_y[slot] = w_slot[slot] * g[src_tok[slot]] — a row gather, because
    # src inverts dst (fastmoe's MOEGather backward re-scatters; the inverse
    # index turns it into a stream read)
    gtok = jnp.take(gc, src_tok, axis=0, mode="fill", fill_value=0)
    grad_y = (w_slot.astype(y.dtype)[:, None] * gtok).astype(y.dtype)
    T, K = scores.shape
    ys = jnp.take(y, dst, axis=0, mode="fill", fill_value=0)
    # same barrier as the forward: keep this gather at y's dtype instead of
    # letting XLA pre-convert the whole expert buffer to f32 for the
    # f32-accumulated grad_scores product (the f32 convert fuses into the
    # product pass after the barrier)
    ys = jax.lax.optimization_barrier(ys).reshape(T, K, -1)
    grad_scores = (ys * gc[:, None, :]).sum(-1, dtype=jnp.float32)
    return grad_y, grad_scores.astype(scores.dtype), None, None, None


_combine_gather.defvjp(_combine_gather_fwd, _combine_gather_bwd)


def expert_ffn_dense(
    h: jnp.ndarray,  # [E, C, d_model]
    params: MoEFfnParams,
    activation: Callable = None,
    compute_dtype=jnp.bfloat16,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Batched per-expert GEMM pair: htoh4 -> act(+dropout) -> h4toh.

    Equivalent of the reference _Expert.forward (custom_moe_layer.py:36-44)
    on a dense [E, C, d] layout; maps onto the MXU as E batched matmuls.

    In bf16 mode the hidden activation is stored bf16 (the MXU still
    accumulates in f32; bias+GELU run on the VPU in bf16) — halving the
    [E, C, d_hidden] HBM traffic.  The f32 path keeps exact f32 epilogues
    for the bit-parity tests.
    """
    if activation is None:
        # torch nn.GELU default = exact erf gelu
        activation = functools.partial(jax.nn.gelu, approximate=False)
    cd = compute_dtype
    if isinstance(params, MoEFfnParamsQ):
        params = dequantize_ffn_params(params, cd)
    # full f32 compute means *really* f32: force the highest matmul precision
    # (XLA's default batched f32 dot is reduced-precision).  In bf16 mode the
    # GEMMs still write f32 (native MXU output path — bf16-out batched GEMMs
    # measured 4x slower in-graph) but the bias+GELU epilogue converts to
    # bf16 so the [E, C, *] buffers that live in HBM are half-width.
    prec = "highest" if cd == jnp.float32 else None
    a = jnp.einsum(
        "ecd,edh->ech", h.astype(cd), params.w1.astype(cd),
        preferred_element_type=jnp.float32, precision=prec,
    )
    a = activation(a + params.b1[:, None, :].astype(jnp.float32)).astype(cd)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, a.shape)
        a = jnp.where(keep, a / (1.0 - dropout_rate), jnp.zeros((), cd))
    o = jnp.einsum(
        "ech,ehd->ecd", a, params.w2.astype(cd),
        preferred_element_type=jnp.float32, precision=prec,
    )
    return (o + params.b2[:, None, :].astype(jnp.float32)).astype(cd)


def _stream_slot_ids(
    top_k_indices: jnp.ndarray,  # [T, K] physical expert ids (or >= E masked)
    stream_ids: jnp.ndarray,  # [T] int32 stream (task) id per token
    num_experts: int,
    num_streams: int,
) -> jnp.ndarray:
    """Map (expert, stream) to a *virtual* expert id e*num_streams + t.

    Stacking independent token streams (the token variant's per-task MoE
    passes) into ONE dispatch: each (stream, expert) pair gets its own
    capacity bucket, and because virtual ids are expert-major the [E*T*C, d]
    buffer reshapes to [E, T*C, d] physical GEMM groups with no data
    movement.  Slot assignment (stable sort by virtual id, rank < capacity)
    is bitwise-identical to running each stream through its own dispatch.
    Masked ids (>= E) stay masked (>= E*T)."""
    return jnp.where(
        top_k_indices < num_experts,
        top_k_indices * num_streams + stream_ids[:, None],
        num_experts * num_streams,
    )


def moe_ffn_local(
    x: jnp.ndarray,  # [T, d_model]
    top_k_indices: jnp.ndarray,  # [T, K] global expert ids
    top_k_gates: jnp.ndarray,  # [T, K]
    params: MoEFfnParams,
    *,
    capacity: int,
    activation: Callable = None,
    compute_dtype=jnp.bfloat16,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    ffn_fn: Optional[Callable] = None,
    num_streams: int = 1,
    stream_ids: Optional[jnp.ndarray] = None,  # [T] when num_streams > 1
) -> jnp.ndarray:
    """Single-shard MoE FFN: gather-dispatch -> per-expert GEMMs -> combine.

    `capacity` is per (stream, expert); with num_streams > 1 the expert
    buffer holds num_streams*capacity rows per physical expert."""
    T, d = x.shape
    K = top_k_indices.shape[-1]
    E = params.w1.shape[0]

    scores = top_k_gates.astype(jnp.float32)
    if num_streams > 1:
        ids = _stream_slot_ids(top_k_indices, stream_ids, E, num_streams)
    else:
        ids = top_k_indices
    plan = make_dispatch_plan(ids.reshape(-1), E * num_streams, capacity,
                              scores_flat=scores.reshape(-1))
    # token id per expert slot; empty slots (src_flat == S == T*K) map to T
    src_tok = plan.src_flat // K
    h = _dispatch_gather(x, src_tok, plan.dst).reshape(
        E, num_streams * capacity, d)
    run_ffn = ffn_fn if ffn_fn is not None else expert_ffn_dense
    y = run_ffn(
        h,
        params,
        activation=activation,
        compute_dtype=compute_dtype,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
    )
    out = _combine_gather(y.reshape(E * num_streams * capacity, d), scores,
                          plan.dst, src_tok, plan.w_slot)
    return out.astype(x.dtype)


def moe_ffn_expert_parallel(
    x: jnp.ndarray,  # [T_local, d_model] (already the per-device shard)
    top_k_indices: jnp.ndarray,  # [T_local, K] GLOBAL expert ids
    top_k_gates: jnp.ndarray,  # [T_local, K]
    params: MoEFfnParams,  # local expert shard: w1 [E_local, d, h], ...
    *,
    expert_axis: str,
    num_experts_global: int,
    capacity: int,  # per (source shard, global expert)
    activation: Callable = None,
    compute_dtype=jnp.bfloat16,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    ffn_fn: Optional[Callable] = None,
    num_streams: int = 1,
    stream_ids: Optional[jnp.ndarray] = None,  # [T_local]
    n_chunks: int = 1,
) -> jnp.ndarray:
    """Expert-parallel MoE FFN body. MUST run inside shard_map with
    `expert_axis` bound; implements the fastmoe exchange with
    lax.all_to_all over ICI (reference: custom_moe_layer.py:263-265).

    `capacity` is per (source shard, stream, expert); virtual-expert slots
    are expert-major so the exchange reshapes are the num_streams == 1 ones
    with capacity -> num_streams * capacity.

    `n_chunks > 1` splits the exchange over groups of LOCAL experts: chunk
    i's all_to_all is data-independent of chunk i-1's expert GEMM, so
    XLA's async-collective scheduler can run a2a(i) on ICI while GEMM(i-1)
    occupies the MXU (the reference's NCCL a2a pair is fully synchronous).
    Exact same rows/weights per expert => numerics identical to n_chunks=1
    at dropout 0 (per-chunk dropout rngs are folded separately).
    Requires E_local % n_chunks == 0; falls back to the largest divisor."""
    T, d = x.shape
    K = top_k_indices.shape[-1]
    ep = jax.lax.axis_size(expert_axis)
    E = num_experts_global
    assert E % ep == 0, "global expert count must divide the expert axis"
    E_local = E // ep
    cap_s = num_streams * capacity  # buffer rows per physical expert

    scores = top_k_gates.astype(jnp.float32)
    if num_streams > 1:
        ids = _stream_slot_ids(top_k_indices, stream_ids, E, num_streams)
    else:
        ids = top_k_indices
    plan = make_dispatch_plan(ids.reshape(-1), E * num_streams, capacity,
                              scores_flat=scores.reshape(-1))
    src_tok = plan.src_flat // K
    send = _dispatch_gather(x, src_tok, plan.dst)  # [E*cap_s, d] by global id

    run_ffn = ffn_fn if ffn_fn is not None else expert_ffn_dense
    C = max(c for c in range(1, min(n_chunks, E_local) + 1)
            if E_local % c == 0)

    if C == 1:
        # monolithic exchange (kept verbatim: this is the flagship
        # single-chip/default program — byte-stable lowering matters for
        # the bench warm-cache sentinel)
        send = send.reshape(ep, E_local * cap_s, d)
        recv = jax.lax.all_to_all(send, expert_axis, split_axis=0,
                                  concat_axis=0)
        # recv[src, e_local*C + c] -> regroup by local expert across sources
        h = (
            recv.reshape(ep, E_local, cap_s, d)
            .transpose(1, 0, 2, 3)
            .reshape(E_local, ep * cap_s, d)
        )
        y = run_ffn(
            h,
            params,
            activation=activation,
            compute_dtype=compute_dtype,
            dropout_rate=dropout_rate,
            dropout_rng=dropout_rng,
        )
        y = (
            y.reshape(E_local, ep, cap_s, d)
            .transpose(1, 0, 2, 3)
            .reshape(ep, E_local * cap_s, d)
        )
        back = jax.lax.all_to_all(y, expert_axis, split_axis=0,
                                  concat_axis=0)
        out = _combine_gather(back.reshape(E * cap_s, d), scores, plan.dst,
                              src_tok, plan.w_slot)
        return out.astype(x.dtype)

    Eg = E_local // C  # local experts per chunk
    send = send.reshape(ep, E_local, cap_s, d)
    backs = []
    for c in range(C):
        send_c = send[:, c * Eg:(c + 1) * Eg].reshape(ep, Eg * cap_s, d)
        recv = jax.lax.all_to_all(send_c, expert_axis,
                                  split_axis=0, concat_axis=0)
        # recv[src, e_local*cap + slot] -> regroup by local expert
        h = (
            recv.reshape(ep, Eg, cap_s, d)
            .transpose(1, 0, 2, 3)
            .reshape(Eg, ep * cap_s, d)
        )
        params_c = jax.tree.map(lambda a: a[c * Eg:(c + 1) * Eg], params)
        rng_c = (None if dropout_rng is None
                 else jax.random.fold_in(dropout_rng, c))
        y = run_ffn(
            h,
            params_c,
            activation=activation,
            compute_dtype=compute_dtype,
            dropout_rate=dropout_rate,
            dropout_rng=rng_c,
        )
        y = (
            y.reshape(Eg, ep, cap_s, d)
            .transpose(1, 0, 2, 3)
            .reshape(ep, Eg * cap_s, d)
        )
        backs.append(
            jax.lax.all_to_all(y, expert_axis, split_axis=0, concat_axis=0)
            .reshape(ep, Eg, cap_s, d))
    back = jnp.concatenate(backs, axis=1)
    out = _combine_gather(back.reshape(E * cap_s, d), scores, plan.dst,
                          src_tok, plan.w_slot)
    return out.astype(x.dtype)


def _expert_param_spec(params, expert_axis):
    """PartitionSpecs sharding the expert-major weight banks over
    `expert_axis` (everything else replicated)."""
    if isinstance(params, MoEFfnParamsQ):
        return MoEFfnParamsQ(
            w1=P(expert_axis, None, None),
            b1=P(expert_axis, None),
            w2=P(expert_axis, None, None),
            b2=P(expert_axis, None),
            s1=P(expert_axis, None),
            s2=P(expert_axis, None),
        )
    return MoEFfnParams(
        w1=P(expert_axis, None, None),
        b1=P(expert_axis, None),
        w2=P(expert_axis, None, None),
        b2=P(expert_axis, None),
    )


def moe_ffn(
    x: jnp.ndarray,  # [B, N, d] or [T, d]
    top_k_indices: jnp.ndarray,
    top_k_gates: jnp.ndarray,
    params: MoEFfnParams,
    *,
    mesh=None,
    expert_axis: Optional[str] = None,
    batch_axes=None,
    capacity_factor: float = 2.0,
    activation: Callable = None,
    compute_dtype=jnp.bfloat16,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    num_experts_global: Optional[int] = None,
    ffn_fn: Optional[Callable] = None,
    a2a_chunks: int = 1,
) -> jnp.ndarray:
    """Top-level MoE FFN. If `mesh` has an expert axis of size > 1, opens a
    shard_map region (tokens sharded over all mesh axes, experts over
    `expert_axis`) and exchanges tokens with all_to_all; otherwise runs the
    single-shard path (still jit-compatible on any backend).

    `a2a_chunks > 1` pipelines the EP exchange (see
    moe_ffn_expert_parallel); ignored on the single-shard path."""
    orig_shape = x.shape
    d = x.shape[-1]
    xt = x.reshape(-1, d)
    it = top_k_indices.reshape(-1, top_k_indices.shape[-1])
    gt = top_k_gates.reshape(-1, top_k_gates.shape[-1])
    T, K = it.shape
    E = num_experts_global or params.w1.shape[0]

    ep = 1
    if mesh is not None and expert_axis is not None and expert_axis in mesh.shape:
        ep = mesh.shape[expert_axis]

    if ep <= 1:
        cap = compute_capacity(T, K, E, capacity_factor)
        out = moe_ffn_local(
            xt, it, gt, params,
            capacity=cap, activation=activation, compute_dtype=compute_dtype,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng, ffn_fn=ffn_fn,
        )
        return out.reshape(orig_shape)

    # tokens are fully data-parallel in the MoE: shard them over EVERY mesh
    # axis (incl. an optional 'seq' axis — parallel.seq_attention), so no
    # axis recomputes the dispatch redundantly
    if batch_axes is None:
        batch_axes = tuple(mesh.axis_names)
    n_shards = 1
    for ax in batch_axes:
        n_shards *= mesh.shape.get(ax, 1)
    assert T % n_shards == 0, f"token count {T} not divisible by {n_shards} shards"
    T_local = T // n_shards
    cap = compute_capacity(T_local, K, E, capacity_factor)

    token_spec = P(tuple(batch_axes))
    param_spec = _expert_param_spec(params, expert_axis)

    def body(xt, it, gt, params, rng):
        if rng is not None:
            for ax in mesh.axis_names:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
        return moe_ffn_expert_parallel(
            xt, it, gt, params,
            expert_axis=expert_axis, num_experts_global=E, capacity=cap,
            activation=activation, compute_dtype=compute_dtype,
            dropout_rate=dropout_rate, dropout_rng=rng, ffn_fn=ffn_fn,
            n_chunks=a2a_chunks,
        )

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(token_spec, token_spec, token_spec, param_spec,
                  None if dropout_rng is None else P()),
        out_specs=token_spec,
        check_vma=False,
    )(xt, it, gt, params, dropout_rng)
    return out.reshape(orig_shape)


def moe_ffn_streams(
    x: jnp.ndarray,  # [T_s, S, d] — T_s independent token streams
    top_k_indices: jnp.ndarray,  # [T_s, S, K] physical expert ids (E = mask)
    top_k_gates: jnp.ndarray,  # [T_s, S, K]
    params: MoEFfnParams,
    *,
    mesh=None,
    expert_axis: Optional[str] = None,
    batch_axes=None,
    capacity_factor: float = 2.0,
    activation: Callable = None,
    compute_dtype=jnp.bfloat16,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    num_experts_global: Optional[int] = None,
    ffn_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Run T_s independent token streams (the token variant's per-task MoE
    passes, reference token/vision_transformer_moe.py:743-812) through ONE
    sort / gather / grouped-GEMM / combine instead of T_s of each.

    Each (stream, expert) pair keeps its own capacity bucket via virtual
    expert ids (see _stream_slot_ids), so slot assignment, drops, and
    outputs are bitwise-identical to T_s separate moe_ffn calls — only the
    kernel-launch count changes (and the GEMM groups grow T_s× rows).
    Under a sharded mesh the tokens are laid out shard-major so every
    device holds exactly the union of the per-stream shards it would have
    owned, preserving per-(source shard, stream, expert) capacity."""
    Ts, S, d = x.shape
    K = top_k_indices.shape[-1]
    E = num_experts_global or params.w1.shape[0]

    ep = 1
    if (mesh is not None and expert_axis is not None
            and expert_axis in mesh.shape):
        ep = mesh.shape[expert_axis]

    if ep <= 1:
        cap = compute_capacity(S, K, E, capacity_factor)
        sid = jnp.repeat(jnp.arange(Ts, dtype=jnp.int32), S)
        out = moe_ffn_local(
            x.reshape(Ts * S, d), top_k_indices.reshape(Ts * S, K),
            top_k_gates.reshape(Ts * S, K), params,
            capacity=cap, activation=activation,
            compute_dtype=compute_dtype, dropout_rate=dropout_rate,
            dropout_rng=dropout_rng, ffn_fn=ffn_fn,
            num_streams=Ts, stream_ids=sid,
        )
        return out.reshape(Ts, S, d)

    if batch_axes is None:
        batch_axes = tuple(mesh.axis_names)
    n_shards = 1
    for ax in batch_axes:
        n_shards *= mesh.shape.get(ax, 1)
    assert S % n_shards == 0, (
        f"stream token count {S} not divisible by {n_shards} shards")
    S_local = S // n_shards
    cap = compute_capacity(S_local, K, E, capacity_factor)

    def to_shard_major(a):
        # [T_s, S, ...] -> [n_shards * T_s * S_local, ...] laid out
        # (shard, stream, local token): shard_map's leading-axis split then
        # hands device i the same token set as T_s per-stream calls would
        return (a.reshape((Ts, n_shards, S_local) + a.shape[2:])
                .swapaxes(0, 1)
                .reshape((n_shards * Ts * S_local,) + a.shape[2:]))

    xt = to_shard_major(x)
    it = to_shard_major(top_k_indices)
    gt = to_shard_major(top_k_gates)
    token_spec = P(tuple(batch_axes))
    param_spec = _expert_param_spec(params, expert_axis)

    def body(xt, it, gt, params, rng):
        if rng is not None:
            for ax in mesh.axis_names:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
        # local block layout is [T_s, S_local] by construction — the
        # stream ids are static
        sid = jnp.repeat(jnp.arange(Ts, dtype=jnp.int32), S_local)
        return moe_ffn_expert_parallel(
            xt, it, gt, params,
            expert_axis=expert_axis, num_experts_global=E, capacity=cap,
            activation=activation, compute_dtype=compute_dtype,
            dropout_rate=dropout_rate, dropout_rng=rng, ffn_fn=ffn_fn,
            num_streams=Ts, stream_ids=sid,
        )

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(token_spec, token_spec, token_spec, param_spec,
                  None if dropout_rng is None else P()),
        out_specs=token_spec,
        check_vma=False,
    )(xt, it, gt, params, dropout_rng)
    return (out.reshape(n_shards, Ts, S_local, d)
            .swapaxes(0, 1)
            .reshape(Ts, S, d))
