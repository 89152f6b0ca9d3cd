"""Task-Conditioned Attention with relation-conditioned expert gating.

Capability match for reference models/moe/token/relation_conditioned_attention.py:
  * BranchEmbedding: learned embedding per branch (0 = neutral, t+1 = task t)
  * RelationRouter: per-head sparse top-k router over (query-branch,
    key-branch) pair embeddings -> expert mixture weights (:47-90)
  * ExpertProjectionPool: per-head expert banks for Q/K/V; effective
    projection = weighted sum of experts (:92-149)
  * task branch: private queries attend to private (t->t) + neutral (t->0)
    keys with relation-conditioned Q (:290-379)
  * neutral branch: neutral queries attend to neutral (0->0) + participant
    private (0->t) key segments, run once (:379-520)
  * combine at private/neutral positions + output projection (:521-607)

TPU-first notes: branch masks are [T, B, N] bool (no int bitmasks); all
relation projections are computed in one einsum batch; there is no dynamic
`has_neutral` branching (static graph, masked instead).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3vit_tpu.moe.gating import gate_init

Dtype = Any


def _xavier_pool_init(key, shape, dtype=jnp.float32):
    # [H, E, D, dk] — xavier_uniform per expert matrix (fan in D, fan out dk)
    d, dk = shape[-2], shape[-1]
    bound = (6.0 / (d + dk)) ** 0.5
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class TaskConditionedAttention(nn.Module):
    num_tasks: int
    dim: int
    num_heads: int
    attn_num_experts: int = 4
    attn_expert_top_k: int = 2
    branch_embed_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        outs: jnp.ndarray,  # [T, B, N, D] normed task token streams
        prev_share_mask: Optional[jnp.ndarray],  # [T, B, N] bool or None
    ) -> jnp.ndarray:
        T, B, N, D = outs.shape
        H = self.num_heads
        dk = D // H
        E = self.attn_num_experts
        scale = dk ** -0.5
        nb = T + 1  # branches: 0 = neutral, t+1 = task t

        if prev_share_mask is None:
            prev_share_mask = jnp.zeros((T, B, N), bool)
        neutral_global = prev_share_mask.any(axis=0)  # [B, N]

        branch_embed = self.param(
            "branch_embed", nn.initializers.normal(0.02),
            (nb, self.branch_embed_dim),
        )
        router_w = self.param(
            "router_w",
            lambda k, s: jax.vmap(
                lambda kk: jax.vmap(
                    lambda kkk: gate_init(kkk, s[2], s[3])
                )(jax.random.split(kk, s[1]))
            )(jax.random.split(k, s[0])),
            (3, H, 2 * self.branch_embed_dim, E),
        )
        router_b = self.param("router_b", nn.initializers.zeros, (3, H, E))
        pools = self.param(
            "expert_pools", _xavier_pool_init, (3, H, E, D, dk)
        )
        q_bias = self.param("q_bias", nn.initializers.zeros, (H, dk))
        k_bias = self.param("k_bias", nn.initializers.zeros, (H, dk))
        v_bias = self.param("v_bias", nn.initializers.zeros, (H, dk))

        def effective_W(a: int, b: int) -> Tuple[jnp.ndarray, ...]:
            """Relation (a -> b) -> (W_Q, W_K, W_V), each [H, D, dk]."""
            f = jnp.concatenate([branch_embed[a], branch_embed[b]])  # [2*bed]
            logits = jnp.einsum("c,phce->phe", f, router_w) + router_b
            dense = jax.nn.softmax(logits, axis=-1)  # [3, H, E]
            k = min(self.attn_expert_top_k, E)
            if k < E:
                topv = jax.lax.top_k(dense, k)[0][..., -1:]
                sparse = jnp.where(dense >= topv, dense, 0.0)
                sparse = sparse / (sparse.sum(-1, keepdims=True) + 1e-9)
            else:
                sparse = dense
            W = jnp.einsum("phe,phedk->phdk", sparse, pools)  # [3, H, D, dk]
            return W[0], W[1], W[2]

        def project(x, W, bias):  # x [..., D], W [H, D, dk] -> [..., H, dk]
            return jnp.einsum("...d,hdk->...hk", x.astype(jnp.float32), W) \
                + bias

        out = jnp.zeros((T, B, N, D), jnp.float32)

        # ---- task branches (t -> t / t -> 0) ----
        for t in range(T):
            bt = t + 1
            Wq_tt, Wk_tt, Wv_tt = effective_W(bt, bt)
            Wq_t0, Wk_t0, Wv_t0 = effective_W(bt, 0)
            x = outs[t]
            t_neutral = prev_share_mask[t]  # [B, N]
            t_private = ~t_neutral

            q_tt = project(x, Wq_tt, q_bias).transpose(0, 2, 1, 3)
            q_t0 = project(x, Wq_t0, q_bias).transpose(0, 2, 1, 3)
            k_tt = project(x, Wk_tt, k_bias).transpose(0, 2, 1, 3)
            k_t0 = project(x, Wk_t0, k_bias).transpose(0, 2, 1, 3)
            score_pp = jnp.einsum("bhnd,bhmd->bhnm", q_tt, k_tt) * scale
            score_pn = jnp.einsum("bhnd,bhmd->bhnm", q_t0, k_t0) * scale
            key_priv = t_private[:, None, None, :]
            attn = jnp.where(key_priv, score_pp, score_pn)
            valid = (t_private | t_neutral)[:, None, None, :]
            attn = jnp.where(valid, attn, -1e30)
            attn = jax.nn.softmax(attn, axis=-1)

            v_tt = project(x, Wv_tt, v_bias)
            v_t0 = project(x, Wv_t0, v_bias)
            v = jnp.where(t_private[..., None, None], v_tt, v_t0)
            v = v.transpose(0, 2, 1, 3)
            o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
            o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
            out = out.at[t].set(o * t_private[..., None])

        # ---- neutral branch (0 -> 0 / 0 -> t), once ----
        neutral_x = outs[0]  # participants share the representation
        Wq_00, Wk_00, Wv_00 = effective_W(0, 0)
        q00 = project(neutral_x, Wq_00, q_bias).transpose(0, 2, 1, 3)
        k00 = project(neutral_x, Wk_00, k_bias).transpose(0, 2, 1, 3)
        v00 = project(neutral_x, Wv_00, v_bias)

        scores = [jnp.einsum("bhnd,bhmd->bhnm", q00, k00) * scale]
        vs = [v00]
        masks = [jnp.broadcast_to(neutral_global[:, None, None, :],
                                  (B, 1, N, N))]
        for t in range(T):
            Wq_0t, Wk_0t, Wv_0t = effective_W(0, t + 1)
            q0t = project(neutral_x, Wq_0t, q_bias).transpose(0, 2, 1, 3)
            kt = project(outs[t], Wk_0t, k_bias).transpose(0, 2, 1, 3)
            vs.append(project(outs[t], Wv_0t, v_bias))
            scores.append(jnp.einsum("bhnd,bhmd->bhnm", q0t, kt) * scale)
            participates = prev_share_mask[t][:, :, None]  # query side [B,N,1]
            key_private = (~prev_share_mask[t])[:, None, :]  # [B,1,N]
            masks.append((participates & key_private)[:, None])

        attn = jnp.concatenate(scores, axis=-1)  # [B, H, N, (1+T)N]
        full_mask = jnp.concatenate(masks, axis=-1)  # [B, 1, N, (1+T)N]
        attn = jnp.where(full_mask, attn, -1e30)
        attn = jnp.where(neutral_global[:, None, :, None], attn, -1e30)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = jnp.nan_to_num(attn, nan=0.0)
        v_all = jnp.concatenate(vs, axis=1).transpose(0, 2, 1, 3)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v_all)
        neutral_out = o.transpose(0, 2, 1, 3).reshape(B, N, D)
        neutral_out = neutral_out * neutral_global[..., None]

        out = out + neutral_out[None] * prev_share_mask[..., None]

        proj = nn.Dense(D, dtype=self.dtype, name="proj")
        return proj(out.astype(self.dtype)).astype(jnp.float32)
