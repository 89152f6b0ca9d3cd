"""Sequence-parallel (Ulysses-style) attention over a mesh 'seq' axis.

SURVEY §5: the reference has no sequence parallelism (≤1025 tokens, naive
O(N²) softmax, ckpt/vision_transformer_moe.py:283-313) — but the TPU design
must leave a sequence axis available for long-token regimes.  This module
provides it as a first-class capability:

  * the mesh gains an optional third axis: ('data', 'seq', 'expert')
    (parallel.mesh.make_mesh(n_data, n_expert, n_seq))
  * attention runs under shard_map with the TOKEN axis sharded over 'seq';
    two `lax.all_to_all`s exchange heads <-> sequence (the DeepSpeed-Ulysses
    pattern, same collective as the MoE expert dispatch): each device holds
    all N tokens for H/s heads during the O(N²) part, and N/s tokens for all
    H heads elsewhere
  * token counts that don't divide the seq axis (ViT's 1+N = 1025) are
    zero-padded and key-masked, so results are bit-comparable to the dense
    form

At ViT scale (N=1025) this is not a throughput win — it exists so the same
model code scales past single-chip attention memory when N grows (e.g.
larger images / finer patches).  ulysses_attention is numerically the exact
dense attention (tests/test_seq_attention.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def pad_to_multiple(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# above this local length the one-pass kernel's [128, N_pad] score rows
# outgrow VMEM; the streaming (online-softmax) kernel takes over
FUSED_KERNEL_MAX_N = 4096


def _streaming_flash(q, k, v, scale, valid_len):
    """Long-context path: jax's streaming TPU flash attention (online
    softmax over K blocks — O(N) memory), with caller padding masked via
    segment ids (pads form their own segment so no softmax row is fully
    masked).  Loses to the fused one-pass kernel at N~1k but is the only
    thing that scales when a sequence-parallel shard holds a long token
    axis (dense would materialize [B, H/s, N, N])."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention as tpu_flash,
    )

    from m3vit_tpu.ops.flash_attention import tpu_backend

    B, N, H, d = q.shape
    npad = (N + 127) // 128 * 128
    pad = npad - N

    def to_bhnd(x):
        x = jnp.swapaxes(x, 1, 2)
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    qp, kp, vp = (to_bhnd(x) for x in (q, k, v))
    pos = jnp.arange(npad)
    seg = jnp.broadcast_to(
        jnp.where(pos < valid_len, 1, 2)[None, :], (B, npad)
    ).astype(jnp.int32)

    def run():
        return tpu_flash(qp, kp, vp, segment_ids=SegmentIds(seg, seg),
                         sm_scale=scale)

    if tpu_backend():
        o = run()
    else:  # M3VIT_FLASH_ATTN=force off-TPU: interpreter, not Mosaic
        with pltpu.force_tpu_interpret_mode():
            o = run()
    return jnp.swapaxes(o[:, :, :N, :], 1, 2)


def _attend(q, k, v, scale, valid_len, compute_dtype):
    """Attention on [B, N, H, d] with key masking past valid_len."""
    from m3vit_tpu.ops.flash_attention import (
        flash_attention,
        interpret_default,
        supported,
        use_flash_default,
    )

    B, N, H, d = q.shape
    if use_flash_default() and supported(H, d):
        if N <= FUSED_KERNEL_MAX_N:
            return flash_attention(q, k, v, scale, interpret_default(),
                                   valid_len)
        if d == 128 or d == 64:  # streaming kernel's supported head dims
            return _streaming_flash(q, k, v, scale, valid_len)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    attn = attn.astype(jnp.float32)
    npad = attn.shape[-1]
    mask = jnp.arange(npad) < valid_len  # [N_pad] key validity
    attn = jnp.where(mask[None, None, None, :], attn, -jnp.inf)
    attn = jax.nn.softmax(attn, axis=-1).astype(compute_dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


def ulysses_attention(
    q: jnp.ndarray,  # [B, N, H, d] (global)
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh,
    seq_axis: str = "seq",
    scale: float,
    compute_dtype=jnp.bfloat16,
    batch_axes=("data", "expert"),
) -> jnp.ndarray:
    """Sequence-sharded exact attention; returns [B, N, H, d].

    Inside shard_map the token axis is sharded over `seq_axis` and the batch
    over `batch_axes`; `lax.all_to_all(split=heads, concat=tokens)` gives
    each device the full token axis for H/s heads, the O(N²) contraction
    runs locally, and the reverse exchange restores token sharding.
    Requires H % seq == 0; N is padded to a multiple of seq and key-masked.
    """
    B, N, H, d = q.shape
    s = mesh.shape[seq_axis]
    if s <= 1:
        return _attend(q, k, v, scale, N, compute_dtype)
    assert H % s == 0, f"heads {H} must divide the seq axis {s}"
    qp, kp, vp = (pad_to_multiple(x, 1, s) for x in (q, k, v))
    n_pad = qp.shape[1]

    baxes = tuple(a for a in batch_axes if mesh.shape.get(a, 1) > 1)
    spec = P(baxes if baxes else None, seq_axis, None, None)

    def body(ql, kl, vl):
        # [b, n/s, H, d] -> exchange - > [b, n, H/s, d]
        qg = jax.lax.all_to_all(ql, seq_axis, split_axis=2, concat_axis=1,
                                tiled=True)
        kg = jax.lax.all_to_all(kl, seq_axis, split_axis=2, concat_axis=1,
                                tiled=True)
        vg = jax.lax.all_to_all(vl, seq_axis, split_axis=2, concat_axis=1,
                                tiled=True)
        og = _attend(qg, kg, vg, scale, N, compute_dtype)
        return jax.lax.all_to_all(og, seq_axis, split_axis=1, concat_axis=2,
                                  tiled=True)

    out = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(qp, kp, vp)
    return out[:, :N]


def seq_axis_size(mesh, seq_axis: str = "seq") -> int:
    if mesh is None:
        return 1
    return mesh.shape.get(seq_axis, 1)
