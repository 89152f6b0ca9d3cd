"""Fused (flash) multi-head attention, forward + backward Pallas kernels.

The model's attention (reference ckpt/vision_transformer_moe.py:283-313) is
naive O(N²) softmax: at the flagship shape (B=8, H=6, N=1025, d=64) the
[B,H,N,N] probability tensor is ~100 MB bf16 and each fwd+bwd makes ~6 HBM
traversals of it — attention step time is pure HBM bandwidth.  These
kernels keep score/probability tiles in VMEM (FlashAttention
restructuring) so HBM traffic drops to the O(N·d) inputs/outputs.

Differences from jax.experimental.pallas.ops.tpu.flash_attention (which
measured SLOWER than naive at these shapes — scripts/bench_attn.py
history), all load-bearing for the win:
  * operates DIRECTLY on the model's fused qkv projection [B, N, 3C]:
    q/k/v head groups are addressed by BlockSpec index maps (no
    [B,N,H,d] -> [B,H,N,d] transposes around the kernel — XLA fuses
    those into the einsums for the naive path, but they materialize as
    real copies around a pallas_call) and the backward emits dqkv in the
    projection's own layout
  * each program computes 128//d heads (a full 128-lane block: head
    PAIRS for d=64), each head's scores contracted separately so heads
    never mix
  * no online-softmax streaming: one q-tile's full score row block
    [bq, N_pad] fits VMEM at these N, so each grid step does one dense
    softmax — fewer VPU rescaling passes
  * K/V blocks are grid-resident (block index constant in the q-tile
    axis): fetched once per (batch, head group), not once per q tile
  * padding is a single masked tail (N=1025 -> 1152), not segment ids;
    padded q rows compute garbage that is sliced off, padded k columns
    are -inf masked
  * backward is ONE kernel producing dq plus VMEM-accumulated dk/dv
    (the revisited-output-block pattern of ops/expert_ffn.py), with p
    recomputed from the forward logsumexp

Numerics match the naive path: scores and softmax in f32, probabilities
cast to the compute dtype for the p·V MXU matmul, f32 accumulation.

Use `supported(num_heads, head_dim)` to check applicability; callers fall
back to the naive einsum path otherwise (and for attention dropout).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQ = 128      # token-axis padding quantum (and the minimum q tile)
_LANES = 128   # block width; programs process _LANES // head_dim heads

#: Optional overrides for the q-tile sizes (None = auto-pick, see _pick_bq).
#: Big tiles win: at the flagship shape (N=1025 -> NP=1152) fwd runs as ONE
#: 1152-row tile and bwd as two 576-row tiles — 1.91 -> 1.53 ms fwd+bwd vs
#: 128-row tiles (scripts/bench_flash_bq.py, v5e).  The auto-pick caps the
#: f32 score-row working set so kernels stay inside the ~16 MB scoped VMEM
#: (BQ=1152 backward exceeds it and fails to compile).
_BQ_FWD: Optional[int] = None
_BQ_BWD: Optional[int] = None
_FWD_VMEM_ROWS = 12 * 1024 * 1024 // 8    # s f32 + p bf16 + temps per row-col
_BWD_VMEM_ROWS = 12 * 1024 * 1024 // 16   # s/p/dp/ds f32 per row-col


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_bq(np_: int, cap_rows: int, override: Optional[int]) -> int:
    """Largest 8-row-aligned q tile that divides the padded extent and keeps
    the per-program f32 [bq, np_] row blocks under the scoped-VMEM budget
    (np_ is always a multiple of 128, so at least bq=128 is reachable)."""
    if override:
        bq = min(override, np_)
    else:
        bq = min(np_, max(_BQ, cap_rows // np_ // 8 * 8))
    while np_ % bq or bq % 8:
        bq -= 8
    return bq


def supported(num_heads: int, head_dim: int) -> bool:
    """Kernel applicability: head groups must tile 128 lanes exactly."""
    return (
        head_dim in (8, 16, 32, 64, 128)
        and (num_heads * head_dim) % _LANES == 0
    )


def _masked_scores(q, k, scale, n_valid):
    s = lax.dot_general(              # [BQ, NP] f32: q · k^T
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if n_valid < s.shape[-1]:         # mask padded keys (static tail)
        col = lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    return s


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, n_valid, d):
    q = q_ref[0]                      # [BQ, 128]  (128//d heads side-by-side)
    k = k_ref[0]                      # [NP, 128]
    v = v_ref[0]
    outs, lses = [], []
    for i in range(q.shape[-1] // d):
        sl = slice(i * d, (i + 1) * d)
        s = _masked_scores(q[:, sl], k[:, sl], scale, n_valid)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = lax.dot_general(          # [BQ, d] f32: p · v
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((o / l).astype(o_ref.dtype))
        # lse is [BQ] but TPU tiling wants >=8-lane stores: replicate x8
        lses.append(jnp.broadcast_to(m + jnp.log(l), (q.shape[0], 8)))
    o_ref[0] = jnp.concatenate(outs, axis=-1)
    lse_ref[0] = jnp.concatenate(lses, axis=-1)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                *, scale, n_valid, d, nq):
    j = pl.program_id(2)
    q = q_ref[0]                      # [BQ, 128]
    k = k_ref[0]                      # [NP, 128]
    v = v_ref[0]
    o = o_ref[0]
    do = do_ref[0]
    cd = q.dtype

    # dk/dv accumulate in f32 VMEM scratch across the q-tile grid axis and
    # are emitted ONCE, in the kernel's compute dtype, at the last tile —
    # halving their HBM writes vs f32 outputs and removing the downstream
    # convert pass (the final bf16 cast is identical to the old
    # cast-in-concat numerics; accumulation itself stays f32)
    @pl.when(j == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    dqs = []
    for i in range(q.shape[-1] // d):
        sl = slice(i * d, (i + 1) * d)
        lse = lse_ref[0][:, 8 * i:8 * i + 1]          # [BQ, 1] f32
        s = _masked_scores(q[:, sl], k[:, sl], scale, n_valid)
        p = jnp.exp(s - lse)          # [BQ, NP] f32 (0 at masked cols)
        dp = lax.dot_general(         # [BQ, NP] f32: do · v^T
            do[:, sl], v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(
            do[:, sl].astype(jnp.float32) * o[:, sl].astype(jnp.float32),
            axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale                 # [BQ, NP] f32
        dqs.append(lax.dot_general(   # ds · k
            ds.astype(cd), k[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype))
        dk_acc[:, sl] += lax.dot_general(             # ds^T · q
            ds.astype(cd), q[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_acc[:, sl] += lax.dot_general(             # p^T · do
            p.astype(cd), do[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)

    @pl.when(j == nq - 1)
    def _emit():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _group_specs(hb: int, np_: int, bq: int):
    """Specs for q/k/v 128-lane head-group column blocks of [B, NP, 3C],
    where C = hb * 128 (hb = number of head groups)."""
    return [
        pl.BlockSpec((1, bq, _LANES), lambda b, g, j: (b, j, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, np_, _LANES), lambda b, g, j: (b, 0, hb + g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, np_, _LANES), lambda b, g, j: (b, 0, 2 * hb + g),
                     memory_space=pltpu.VMEM),
    ]


def _pad_tokens(x: jnp.ndarray, np_: int) -> jnp.ndarray:
    if x.shape[1] == np_:
        return x
    return jnp.pad(x, ((0, 0), (0, np_ - x.shape[1]), (0, 0)))


def _fwd(qkv, num_heads, scale, interpret, valid):
    B, N, C3 = qkv.shape
    C = C3 // 3
    d = C // num_heads
    assert supported(num_heads, d), (num_heads, d)
    hb = C // _LANES                  # head groups (128-lane blocks) per C
    hpg = _LANES // d                 # heads per group
    np_ = _ceil_to(N, _BQ)
    bq = _pick_bq(np_, _FWD_VMEM_ROWS, _BQ_FWD)
    qkvp = _pad_tokens(qkv, np_)
    nq = np_ // bq
    kernel = functools.partial(_fwd_kernel, scale=scale, n_valid=valid, d=d)
    o, lse = pl.pallas_call(
        kernel,
        grid=(B, hb, nq),
        in_specs=_group_specs(hb, np_, bq),
        out_specs=[
            pl.BlockSpec((1, bq, _LANES), lambda b, g, j: (b, j, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8 * hpg),
                         lambda b, g, j: (b * hb + g, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, np_, C), qkv.dtype),
            jax.ShapeDtypeStruct((B * hb, np_, 8 * hpg), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * np_ * np_ * d,
            bytes_accessed=(3 + 1) * B * np_ * C * 2,
            transcendentals=B * num_heads * np_ * np_,
        ),
        interpret=interpret,
    )(qkvp, qkvp, qkvp)
    return o, lse, qkvp


def _bwd(qkvp, o, lse, dout, N, num_heads, scale, interpret, valid):
    B, np_, C = o.shape
    d = C // num_heads
    hb = C // _LANES
    hpg = _LANES // d
    bq = _pick_bq(np_, _BWD_VMEM_ROWS, _BQ_BWD)
    nq = np_ // bq
    dop = _pad_tokens(dout, np_)
    kernel = functools.partial(_bwd_kernel, scale=scale, n_valid=valid, d=d,
                               nq=nq)
    tile = pl.BlockSpec((1, bq, _LANES), lambda b, g, j: (b, j, g),
                        memory_space=pltpu.VMEM)
    resident = pl.BlockSpec((1, np_, _LANES), lambda b, g, j: (b, 0, g),
                            memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, hb, nq),
        in_specs=_group_specs(hb, np_, bq) + [
            tile,                                     # o
            tile,                                     # do
            pl.BlockSpec((1, bq, 8 * hpg),
                         lambda b, g, j: (b * hb + g, j, 0),
                         memory_space=pltpu.VMEM),    # lse
        ],
        out_specs=[tile, resident, resident],
        out_shape=[
            jax.ShapeDtypeStruct((B, np_, C), qkvp.dtype),
            jax.ShapeDtypeStruct((B, np_, C), qkvp.dtype),
            jax.ShapeDtypeStruct((B, np_, C), qkvp.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((np_, _LANES), jnp.float32),   # dk accumulator
            pltpu.VMEM((np_, _LANES), jnp.float32),   # dv accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * num_heads * np_ * np_ * d,
            bytes_accessed=8 * B * np_ * C * 2,
            transcendentals=B * num_heads * np_ * np_,
        ),
        interpret=interpret,
    )(qkvp, qkvp, qkvp, o, dop, lse)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return (dqkv[:, :N],)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def flash_attention_qkv(qkv, num_heads: int, scale: float,
                        interpret: bool = False,
                        valid_len: Optional[int] = None):
    """Multi-head softmax attention on the fused qkv projection.

    qkv: [B, N, 3C] laid out as the torch/reference fused projection
    [q; k; v] with per-head slices q_h = qkv[..., h*d:(h+1)*d] etc
    (reference :293-296).  Returns [B, N, C] (heads re-interleaved, ready
    for the output projection).  Requires supported(num_heads, C//num_heads).
    valid_len masks keys >= valid_len (for token axes padded by the CALLER,
    e.g. sequence parallelism); default = N.
    """
    o, _, _ = _fwd(qkv, num_heads, scale, interpret,
                   valid_len or qkv.shape[1])
    return o[:, :qkv.shape[1]]


def _vjp_fwd(qkv, num_heads, scale, interpret, valid_len):
    o, lse, qkvp = _fwd(qkv, num_heads, scale, interpret,
                        valid_len or qkv.shape[1])
    return o[:, :qkv.shape[1]], (qkvp, o, lse, qkv.shape[1])


def _vjp_bwd(num_heads, scale, interpret, valid_len, res, g):
    qkvp, o, lse, N = res
    return _bwd(qkvp, o, lse, g, N, num_heads, scale, interpret,
                valid_len or N)


flash_attention_qkv.defvjp(_vjp_fwd, _vjp_bwd)


def flash_attention_qkv_sharded(qkv, num_heads: int, scale: float,
                                interpret: bool = False, *,
                                mesh=None, seq_axis: str = "seq"):
    """Mesh-aware flash attention: GSPMD cannot partition a top-level
    ``pallas_call`` ("Mosaic kernels cannot be automatically partitioned"
    — found by the v5e-8 AOT topology compile, scripts/dump_ep_schedule.py),
    so on a >1-device mesh the kernel runs inside a ``shard_map`` sharding
    the BATCH dim over every non-seq axis (attention is batch-parallel,
    never token-parallel; a sharded seq axis takes the Ulysses path in
    models/vit.py and never reaches this call).  Single-device meshes and
    mesh=None trace the bare kernel, byte-identical to the single-chip
    flagship program."""
    if mesh is None or mesh.size <= 1:
        return flash_attention_qkv(qkv, num_heads, scale, interpret)

    from jax.sharding import PartitionSpec as P

    B = qkv.shape[0]
    batch_axes = tuple(
        a for a in mesh.axis_names if a != seq_axis and mesh.shape[a] > 1)
    nb = 1
    for a in batch_axes:
        nb *= mesh.shape[a]
    spec = (P(batch_axes, None, None) if batch_axes and B % nb == 0
            else P(None, None, None))

    def body(x):
        return flash_attention_qkv(x, num_heads, scale, interpret)

    return jax.shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec,
                         check_vma=False)(qkv)


def flash_attention(q, k, v, scale: float, interpret: bool = False,
                    valid_len: Optional[int] = None):
    """Generic [B, N, H, d] entry point (tests / non-fused callers)."""
    B, N, H, d = q.shape
    qkv = jnp.concatenate(
        [x.reshape(B, N, H * d) for x in (q, k, v)], axis=-1)
    return flash_attention_qkv(
        qkv, H, scale, interpret, valid_len).reshape(B, N, H, d)


def tpu_backend() -> bool:
    """True on real TPU hardware (incl. the relay's 'axon' platform name —
    same convention as ops.expert_ffn.pallas_expert_ffn_available)."""
    return jax.default_backend() in ("tpu", "axon")


def interpret_default() -> bool:
    """interpret-mode default for kernel call sites: compiled on TPU
    backends, interpreter elsewhere (keeps use_flash=True CPU-testable)."""
    return not tpu_backend()


def use_flash_default() -> bool:
    """Auto policy: compiled Pallas needs a real TPU backend.

    M3VIT_FLASH_ATTN=0 force-disables (ops emergency hatch);
    M3VIT_FLASH_ATTN=force enables even off-TPU (interpret mode — slow,
    for end-to-end debugging only)."""
    import os

    v = os.environ.get("M3VIT_FLASH_ATTN", "1").lower()
    if v in ("0", "false"):
        return False
    if v == "force":
        return True
    return tpu_backend()
