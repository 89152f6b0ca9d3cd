"""Noisy-VMoE top-k gating and load-balancing math, as pure jnp functions.

Semantics match the reference exactly (SURVEY invariants #2-#4):
  * gating = softmax over noisy logits FIRST, then top-(k+1); routing uses the
    top-k; gate scores are the raw top-k softmax probs, NOT renormalized
    (reference: models/moe/ckpt/noisy_gate_vmoe.py:196-204)
  * noise stddev = noise_std / num_experts, applied only in training
    (reference: noisy_gate_vmoe.py:89-93)
  * the smooth load estimator prob_in_top_k receives RAW clean/noisy logits
    but POST-SOFTMAX top values — faithfully reproducing the reference's
    mixed-space computation (reference: ckpt/vision_transformer_moe.py:33-71
    called at :457 with `top_logits` = softmax-probability top-(k+1))
  * cv_squared uses the unbiased variance (torch `.var()` default)
    (reference: ckpt/vision_transformer_moe.py:73-87)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class GateOutput(NamedTuple):
    """Everything the MoE block needs from one gate evaluation."""

    top_k_indices: jnp.ndarray  # [T, K] int32 — global expert ids
    top_k_gates: jnp.ndarray  # [T, K] float — raw softmax probs (not renorm.)
    clean_logits: jnp.ndarray  # [T, E] pre-noise logits
    noisy_logits: jnp.ndarray  # [T, E] post-noise logits
    noise_stddev: jnp.ndarray  # scalar
    top_logits: jnp.ndarray  # [T, min(K+1, E)] softmax probs of top-(k+1)
    gates: jnp.ndarray  # [T, E] sparse softmax probs (zeros off the top-k)


def small_topk(x: jnp.ndarray, m: int):
    """top-m of x [T, E] along the last axis, bit-matching jax.lax.top_k
    (descending values; ties broken toward the lower index).

    Rank/one-hot formulation for small E (<= a few hundred): rank_j = number
    of entries that beat j, then select by rank with a dense one-hot
    contraction.  lax.top_k's TPU lowering sorts each row AND — decisive for
    the train step — its gradient is a row-serial scalar scatter into [T, E]
    (~0.28 ms per gate call at T=8200: TPU scatters serialize element by
    element).  Here the VJP of the value selection is a dense [T, E, m]
    einsum on the VPU; the index outputs are piecewise-constant exactly like
    top_k's.
    """
    T, E = x.shape
    xi = x[:, :, None]  # [t, i, j->broadcast]
    xj = x[:, None, :]  # [t, i->broadcast, j]
    i_lt_j = jnp.arange(E)[:, None] < jnp.arange(E)[None, :]
    beats = (xi > xj) | ((xi == xj) & i_lt_j[None])  # [t, i, j]: i before j
    rank = jax.lax.stop_gradient(
        beats.sum(axis=1, dtype=jnp.int32))  # [T, j] in [0, E)
    onehot = (rank[:, :, None] == jnp.arange(m, dtype=jnp.int32)).astype(
        x.dtype)  # [T, E, m]
    vals = (x[:, :, None] * onehot).sum(axis=1)
    idx = (jnp.arange(E, dtype=jnp.int32)[None, :, None]
           * onehot.astype(jnp.int32)).sum(axis=1)
    return vals, idx


def gate_init(key: jax.Array, d_gate: int, num_experts: int) -> jnp.ndarray:
    """w_gate init: kaiming_uniform(a=sqrt(5)) on a [d_gate, E] tensor.

    torch computes fan_in = tensor.size(1) = E for a 2-D weight, giving
    bound = 1/sqrt(E) (reference: noisy_gate_vmoe.py:65-72).
    """
    bound = 1.0 / jnp.sqrt(jnp.asarray(num_experts, jnp.float32))
    return jax.random.uniform(
        key, (d_gate, num_experts), jnp.float32, minval=-bound, maxval=bound
    )


def noisy_vmoe_gate(
    gate_inp: jnp.ndarray,
    w_gate: jnp.ndarray,
    *,
    top_k: int,
    noise_std: float,
    train: bool,
    rng: Optional[jax.Array] = None,
    no_noise: bool = False,
    expert_mask: Optional[jnp.ndarray] = None,
    build_dense_gates: bool = True,
    clean_logits: Optional[jnp.ndarray] = None,
) -> GateOutput:
    """NoisyGate_VMoE forward (reference: noisy_gate_vmoe.py:80-264).

    gate_inp: [T, d_gate]; w_gate: [d_gate, E]. `train` must be static.
    expert_mask: optional [E] bool — routing restricted to True experts (the
    reference's `select_idx` column-slicing, noisy_gate_vmoe.py:170-172,
    expressed as a -inf logit mask so expert ids stay global).
    clean_logits: optional precomputed [T, E] logits (the stacked multi-gate
    path computes per-row logits against per-task gates before calling in);
    when given, gate_inp/w_gate are not consulted for the matmul.
    """
    num_experts = w_gate.shape[-1]
    if clean_logits is None:
        clean_logits = gate_inp.astype(jnp.float32) @ w_gate.astype(jnp.float32)
    else:
        clean_logits = clean_logits.astype(jnp.float32)
    raw_noise_stddev = noise_std / num_experts
    use_noise = train and not no_noise
    noise_stddev = jnp.asarray(raw_noise_stddev if use_noise else 0.0, jnp.float32)

    if use_noise:
        if rng is None:
            raise ValueError("training noisy gate requires an rng")
        noise = jax.random.normal(rng, clean_logits.shape, jnp.float32)
        noisy_logits = clean_logits + noise * noise_stddev
    else:
        noisy_logits = clean_logits

    if expert_mask is not None:
        neg = jnp.asarray(-1e30, jnp.float32)
        noisy_logits = jnp.where(expert_mask[None, :], noisy_logits, neg)

    probs = jax.nn.softmax(noisy_logits, axis=-1)
    m = min(top_k + 1, num_experts)
    # small_topk materializes a [T, E, E] comparison tensor; only measured a
    # win at E=16 (flagship), where it removes lax.top_k's row-serial scatter
    # gradient.  Cap E so the intermediate stays modest (E=64, T=40k bf16 ->
    # ~320 MB transient, fine; E=256 would be ~5 GB and O(E^2) VPU work).
    if num_experts <= 64:
        top_logits, top_indices = small_topk(probs, m)
    else:
        top_logits, top_indices = jax.lax.top_k(probs, m)
    top_k_gates = top_logits[:, :top_k]
    top_k_indices = top_indices[:, :top_k].astype(jnp.int32)

    if build_dense_gates:
        # dense [T, E] gates with the top-k probs scattered back in
        gates = jnp.zeros_like(probs)
        t_idx = jnp.arange(probs.shape[0])[:, None]
        gates = gates.at[t_idx, top_k_indices].set(top_k_gates)
    else:
        # hot path: consumers derive importance/load/entropy from the top-k
        # fields; skip the [T, E] scatter (moe_aux_loss handles gates=None)
        gates = None

    return GateOutput(
        top_k_indices=top_k_indices,
        top_k_gates=top_k_gates,
        clean_logits=clean_logits,
        noisy_logits=noisy_logits,
        noise_stddev=noise_stddev,
        top_logits=top_logits,
        gates=gates,
    )


def _normal_cdf(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(jnp.asarray(2.0, x.dtype))))


def prob_in_top_k(
    clean_values: jnp.ndarray,
    noisy_values: jnp.ndarray,
    noise_stddev: jnp.ndarray,
    noisy_top_values: jnp.ndarray,
    top_k: int,
) -> jnp.ndarray:
    """Smooth estimator of P[value in top-k] under re-drawn noise.

    clean_values/noisy_values: [T, E]; noisy_top_values: [T, m] with m = k+1.
    Exactly reproduces reference ckpt/vision_transformer_moe.py:33-71
    (including its mixing of logit-space values with probability-space
    thresholds — required for numerical parity).
    """
    threshold_if_in = noisy_top_values[:, top_k][:, None]  # [T, 1]
    is_in = noisy_values > threshold_if_in
    threshold_if_out = noisy_top_values[:, top_k - 1][:, None]
    prob_if_in = _normal_cdf((clean_values - threshold_if_in) / noise_stddev)
    prob_if_out = _normal_cdf((clean_values - threshold_if_out) / noise_stddev)
    return jnp.where(is_in, prob_if_in, prob_if_out)


def gates_to_load(gates: jnp.ndarray) -> jnp.ndarray:
    """True per-expert load: #tokens with gate > 0 (reference :23-31)."""
    return (gates > 0).sum(axis=0).astype(jnp.float32)


def cv_squared(x: jnp.ndarray) -> jnp.ndarray:
    """Squared coefficient of variation, unbiased variance (reference :73-87)."""
    x = x.astype(jnp.float32).reshape(-1)
    if x.shape[0] <= 1:
        return jnp.asarray(0.0, jnp.float32)
    eps = 1e-10
    return jnp.var(x, ddof=1) / (jnp.mean(x) ** 2 + eps)


def moe_aux_loss(
    gate: GateOutput, top_k: int, num_experts: int, train: bool,
    row_mask: Optional[jnp.ndarray] = None,
    segments: int = 1,
) -> jnp.ndarray:
    """cv²(importance) + cv²(load) for one MoE block.

    Load uses the smooth estimator when noise is active, else the hard count
    (reference: ckpt/vision_transformer_moe.py:452-459, 538-542).
    row_mask ([T] bool): restrict the statistics to these tokens (the token
    variant computes cv over computed/TS tokens only, reference
    token/vision_transformer_moe.py:794-801).
    segments > 1: tokens are `segments` equal task-major groups (the stacked
    multi-gate pass); cv² is computed per group and summed — exactly the sum
    of per-task-pass balance losses in the reference's one-pass-per-task loop
    (models/models.py:299-320).
    """
    if not train:
        return jnp.asarray(0.0, jnp.float32)
    # the gate may operate on a narrowed expert window (regu_experts_fromtask
    # slices w_gate columns) — statistics span the window, not num_experts
    e_width = gate.clean_logits.shape[-1]
    importance = gate_importance(gate, segments=segments).reshape(
        segments, e_width
    )
    use_smooth = top_k < num_experts
    if use_smooth:
        smooth = prob_in_top_k(
            gate.clean_logits,
            gate.noisy_logits,
            jnp.maximum(gate.noise_stddev, 1e-20),
            gate.top_logits,
            top_k,
        )
        if row_mask is not None:
            smooth = smooth * row_mask[:, None]
        smooth = smooth.reshape(segments, -1, e_width).sum(axis=1)
        hard = gate_load_counts(gate, segments=segments).reshape(
            segments, e_width
        )
        load = jnp.where(jnp.abs(jnp.max(gate.noise_stddev)) > 1e-6, smooth,
                         hard)
    else:
        load = gate_load_counts(gate, segments=segments).reshape(
            segments, e_width
        )
    per_seg = jax.vmap(lambda i, l: cv_squared(i) + cv_squared(l))(
        importance, load
    )
    return per_seg.sum()


def _segment_ids(gate: GateOutput, segments: int) -> jnp.ndarray:
    """Expert ids offset into per-segment banks: token t of segment s scatters
    into row s.  Tokens are task-major equal groups."""
    T, K = gate.top_k_indices.shape
    E = gate.clean_logits.shape[-1]
    seg = jnp.repeat(jnp.arange(segments, dtype=jnp.int32), T // segments)
    return gate.top_k_indices + seg[:, None] * E


def _onehot_accumulate(idx: jnp.ndarray, w: jnp.ndarray,
                       banks: int) -> jnp.ndarray:
    """sum_s w[s] into bank idx[s], as a one-hot contraction.

    The obvious `zeros(banks).at[idx].add(w)` is a TPU scalar scatter-add —
    serialized element-by-element (~0.3 ms at S=32.8k, measured ~41 us per
    [E]-output fusion in the train step).  The dense [S, banks] one-hot dot
    streams at memory bandwidth, and its VJP w.r.t. `w` is a dense dot too.
    """
    oh = (idx[:, None] == jnp.arange(banks, dtype=idx.dtype)[None, :])
    return jnp.einsum("s,sb->b", w, oh.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


def gate_importance(gate: GateOutput, segments: int = 1) -> jnp.ndarray:
    """Per-expert sum of gate probs; == gates.sum(0) without the dense scatter.

    segments=1 returns [E]; segments>1 returns [S, E] per task-major group.
    """
    E = gate.clean_logits.shape[-1]
    if segments == 1:
        if gate.gates is not None:
            return gate.gates.sum(axis=0)
        return _onehot_accumulate(
            gate.top_k_indices.reshape(-1), gate.top_k_gates.reshape(-1), E
        )
    idx = _segment_ids(gate, segments).reshape(-1)
    return _onehot_accumulate(
        idx, gate.top_k_gates.reshape(-1), segments * E
    ).reshape(segments, E)


def gate_load_counts(gate: GateOutput, segments: int = 1) -> jnp.ndarray:
    """Per-expert routed-token counts (== (gates > 0).sum(0))."""
    E = gate.clean_logits.shape[-1]
    sel = (gate.top_k_gates.reshape(-1) > 0).astype(jnp.float32)
    if segments == 1:
        if gate.gates is not None:
            return gates_to_load(gate.gates)
        return _onehot_accumulate(gate.top_k_indices.reshape(-1), sel, E)
    idx = _segment_ids(gate, segments).reshape(-1)
    return _onehot_accumulate(idx, sel, segments * E).reshape(segments, E)


def noisy_gate_init(key: jax.Array, d_gate: int, num_experts: int):
    """w_gate + w_noise for the learned-noise gate (reference gates.py:68-90:
    both kaiming_uniform(a=sqrt(5)) on [d, E] => bound 1/sqrt(E))."""
    k1, k2 = jax.random.split(key)
    return gate_init(k1, d_gate, num_experts), gate_init(k2, d_gate, num_experts)


def noisy_gate(
    gate_inp: jnp.ndarray,
    w_gate: jnp.ndarray,
    w_noise: jnp.ndarray,
    *,
    top_k: int,
    train: bool,
    rng: Optional[jax.Array] = None,
    no_noise: bool = False,
    noise_epsilon: float = 1e-2,
    expert_mask: Optional[jnp.ndarray] = None,
) -> GateOutput:
    """NoisyGate (`moe_gate_type="noisy"`): learned per-element noise
    (softplus(x @ w_noise) + eps), top-k of RAW logits, scores = softmax over
    the selected top-k logits (renormalized — unlike the VMoE gate)
    (reference: models/moe/gates.py:195-280).

    GateOutput.noise_stddev here is the [T, E] per-element stddev (the VMoE
    gate returns a scalar); moe_aux_loss handles both.
    """
    num_experts = w_gate.shape[-1]
    x = gate_inp.astype(jnp.float32)
    clean_logits = x @ w_gate.astype(jnp.float32)
    raw_std = x @ w_noise.astype(jnp.float32)
    use_noise = train and not no_noise
    if use_noise:
        if rng is None:
            raise ValueError("training noisy gate requires an rng")
        noise_stddev = jax.nn.softplus(raw_std) + noise_epsilon
        noisy_logits = clean_logits + (
            jax.random.normal(rng, clean_logits.shape) * noise_stddev
        )
    else:
        noise_stddev = jnp.zeros_like(clean_logits)
        noisy_logits = clean_logits

    if expert_mask is not None:
        noisy_logits = jnp.where(expert_mask[None, :], noisy_logits, -1e30)

    m = min(top_k + 1, num_experts)
    top_logits, top_indices = jax.lax.top_k(noisy_logits, m)
    top_k_logits = top_logits[:, :top_k]
    top_k_indices = top_indices[:, :top_k].astype(jnp.int32)
    top_k_gates = jax.nn.softmax(top_k_logits, axis=-1)

    gates = jnp.zeros_like(noisy_logits)
    t_idx = jnp.arange(noisy_logits.shape[0])[:, None]
    gates = gates.at[t_idx, top_k_indices].set(top_k_gates)

    return GateOutput(
        top_k_indices=top_k_indices,
        top_k_gates=top_k_gates,
        clean_logits=clean_logits,
        noisy_logits=noisy_logits,
        noise_stddev=noise_stddev,
        top_logits=top_logits,
        gates=gates,
    )


def moe_aux_loss_noisy(
    gate: GateOutput, top_k: int, num_experts: int, train: bool
) -> jnp.ndarray:
    """cv² balance loss for the learned-noise gate: load uses the smooth
    estimator with per-element stddev (reference gates.py:249-262)."""
    if not train:
        return jnp.asarray(0.0, jnp.float32)
    importance = gate.gates.sum(axis=0)
    if top_k < num_experts:
        std = jnp.maximum(gate.noise_stddev, 1e-20)
        load = prob_in_top_k(
            gate.clean_logits, gate.noisy_logits, std, gate.top_logits, top_k
        ).sum(axis=0)
    else:
        load = gates_to_load(gate.gates)
    return cv_squared(importance) + cv_squared(load)
