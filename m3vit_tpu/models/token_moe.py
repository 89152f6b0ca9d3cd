"""Token persistent-sharing MoE ViT — the authors' "token" variant, TPU-native.

Capability match for reference models/moe/token/* (vision_transformer_moe.py,
shareability.py, sharing_loss.py, custom_moe_layer.py):

  * per-task token streams, all tasks advanced together block by block
  * ShareabilityPredictor: Gumbel-softmax shared/private score per token
  * Merge-Maintain-Split transition: positions where >=2 tasks agree
    (score >= gamma) become shared; a representative token is the
    score-weighted soft mix of the participating tasks' tokens
  * persistent-sharing broadcast: participating tasks' tokens are overwritten
    by the representative before and after the FFN sublayer
  * shared FFN runs ONCE per shared position; task-specific (TS) tokens go
    through the per-task dense MLP or MoE pathway
  * SharingRegularizationLoss  λ·max(0, S² − Σ_t S_t²)
  * bootstrap gamma at the first MoE block

TPU-first redesign (semantics preserved, implementation idiomatic):
  * task streams are a stacked [T, B, N, C] tensor, masks are [T, B, N] bool
    (the reference packs them into an int64 bitmask)
  * "compute only TS tokens" becomes masked dispatch: shared tokens get an
    out-of-range expert id, so they never occupy MoE capacity — real compute
    saving with fully static shapes (no host-side index gathering)
  * the dense sublayer computes all tokens and masks the residual; the MoE
    sublayer skips shared tokens in dispatch; the shared FFN runs on the
    dense [B, N, C] representative buffer masked to valid positions
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3vit_tpu.models.vit import (
    Attention,
    MlpBlock,
    PatchEmbed,
    gelu_exact,
    trunc_normal_init,
)
from m3vit_tpu.models.vit_moe import TaskRepresentMlp, _expert_kernel_init
from m3vit_tpu.moe.dispatch import (MoEFfnParams, moe_ffn,
                                     moe_ffn_streams)
from m3vit_tpu.moe.gating import gate_init, moe_aux_loss, noisy_vmoe_gate

Dtype = Any


class ShareabilityPredictor(nn.Module):
    """Gumbel-softmax shared/private head (reference shareability.py:14-85)."""

    d_task_emb: int = 0
    temperature: float = 1.0
    hard: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, task_emb: Optional[jnp.ndarray],
                 train: bool = False,
                 rng: Optional[jax.Array] = None,
                 temperature: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # `temperature` (traced scalar) overrides the static field: the
        # per-epoch schedule (reference common_config.py:927-957 +
        # train_fastmoe.py:628-632) changes it without recompiling
        B, N, C = x.shape
        d_in = C + (self.d_task_emb if self.d_task_emb > 0 else 0)
        w = self.param("w_gate", lambda k, s: gate_init(k, s[0], s[1]),
                       (d_in, 2))
        inp = x.reshape(-1, C).astype(jnp.float32)
        if self.d_task_emb > 0:
            assert task_emb is not None
            te = jnp.broadcast_to(task_emb[None, :], (inp.shape[0],
                                                      self.d_task_emb))
            inp = jnp.concatenate([inp, te], axis=-1)
        logits = inp @ w

        if train and rng is not None:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(rng, logits.shape, minval=1e-10, maxval=1.0)
            ))
            tau = (temperature if temperature is not None
                   else self.temperature)
            y = jax.nn.softmax((logits + g) / tau, axis=-1)
            if self.hard:
                hard = jax.nn.one_hot(y.argmax(-1), 2)
                y = hard + y - jax.lax.stop_gradient(y)
        else:
            # eval: hard gumbel without noise == argmax one-hot
            y = jax.nn.one_hot(logits.argmax(-1), 2)
        return y[:, 1].reshape(B, N)


def transition_stage(
    outs: jnp.ndarray,  # [T, B, N, C]
    g_shared: jnp.ndarray,  # [T, B, N]
    gamma: float,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict]:
    """Merge-Maintain-Split (reference token/vision_transformer_moe.py:519-611).

    Returns (share_mask [T,B,N] bool, valid [B,N] bool,
             shared_x [B,N,C] soft-mixed representative, stats)."""
    M = g_shared >= gamma
    count = M.sum(axis=0)
    valid = count >= 2
    M = M & valid[None]

    GM = g_shared * M.astype(g_shared.dtype)  # [T, B, N]
    w = GM / (GM.sum(axis=0, keepdims=True) + eps)
    shared_x = jnp.einsum("tbn,tbnc->bnc", w, outs.astype(jnp.float32))
    stats = {
        "shared_positions": valid.sum().astype(jnp.float32),
        "shared_tasktoken_count": M.sum().astype(jnp.float32),
    }
    return M, valid, shared_x, stats


def apply_shared_broadcast(outs, share_mask, shared_x):
    """outs[t][b,n] <- shared_x[b,n] where task t participates
    (reference :613-671)."""
    return jnp.where(share_mask[..., None], shared_x[None].astype(outs.dtype),
                     outs)


def sharing_regularization_loss(share_mask: jnp.ndarray,
                                lam: float) -> jnp.ndarray:
    """λ·max(0, S² − Σ_t S_t²) (reference sharing_loss.py:27-56)."""
    if lam <= 0:
        return jnp.asarray(0.0, jnp.float32)
    valid = share_mask.any(axis=0)
    S = valid.sum().astype(jnp.float32)
    S_t = share_mask.sum(axis=(1, 2)).astype(jnp.float32)
    return lam * jnp.maximum(S * S - (S_t**2).sum(), 0.0)


class TokenBlock(nn.Module):
    """One persistent-sharing transformer block over stacked task streams."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    moe: bool = False
    moe_hidden_dim: int = 384
    moe_experts: int = 16
    moe_top_k: int = 4
    vmoe_noisy_std: float = 1.0
    multi_gate: bool = False
    num_tasks: int = 2
    gate_task_specific_dim: int = 64
    capacity_factor: float = 2.0
    eval_capacity_factor: float = 4.0
    use_pallas_ffn: bool = False
    use_pallas_dense_ffn: bool = False  # fused MlpBlock in dense stages
    # fold the T per-task MoE dispatches into one stacked dispatch
    # (moe_ffn_streams) when the reuse cache is off — exact numerics.
    # Default OFF: measured 318 vs 283 ms/step on v5e-1 (B=8 512^2) — the
    # combine-side gathers stream ~137 GB/s from the 5x-larger slot buffer
    # (158 MB) vs ~650 GB/s from the per-task 31 MB one (page locality),
    # outweighing the 5x launch savings.  Re-evaluate on pods where the
    # per-dispatch latency and a2a count dominate.
    batched_dispatch: bool = False
    mesh: Any = None
    expert_axis: Optional[str] = None
    dtype: Dtype = jnp.float32
    # relation-conditioned task attention (§4; reference
    # relation_conditioned_attention.py)
    use_task_conditioned_attn: bool = False
    attn_num_experts: int = 4
    attn_expert_top_k: int = 2
    branch_embed_dim: int = 32

    @nn.compact
    def __call__(
        self,
        outs: jnp.ndarray,  # [T, B, N, C]
        task_emb: Optional[jnp.ndarray],  # [T, d_emb]
        share_gamma: float,
        train: bool = False,
        prev_share_mask: Optional[jnp.ndarray] = None,  # [T, B, N] bool
        reuse_bits: Optional[jnp.ndarray] = None,  # [B, N] int32 task bitmask
        share_temp: Optional[jnp.ndarray] = None,  # scheduled gumbel tau
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict]:
        T, B, N, C = outs.shape
        norm1 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")

        # 1) attention stage: branch-aware (task-conditioned) or per-task
        #    standard attention with shared weights
        if self.use_task_conditioned_attn:
            from m3vit_tpu.models.relation_attention import (
                TaskConditionedAttention,
            )

            normed = norm1(outs.reshape(T * B, N, C)).reshape(T, B, N, C)
            h = TaskConditionedAttention(
                num_tasks=T, dim=C, num_heads=self.num_heads,
                attn_num_experts=self.attn_num_experts,
                attn_expert_top_k=self.attn_expert_top_k,
                branch_embed_dim=self.branch_embed_dim,
                dtype=self.dtype, name="attn",
            )(normed, prev_share_mask)
            outs = outs + h
        else:
            attn = Attention(self.num_heads, self.qkv_bias, dtype=self.dtype,
                             name="attn")
            h = norm1(outs.reshape(T * B, N, C))
            h = attn(h.astype(self.dtype), train).reshape(T, B, N, C)
            outs = outs + h

        # 2) shareability scores per task
        share_pred = ShareabilityPredictor(
            d_task_emb=self.gate_task_specific_dim, name="share_pred"
        )
        rng = self.make_rng("gate_noise") if train else None
        g = []
        for t in range(T):
            r = jax.random.fold_in(rng, t) if rng is not None else None
            te = task_emb[t] if task_emb is not None else None
            g.append(share_pred(outs[t], te, train, r, share_temp))
        g_shared = jnp.stack(g)  # [T, B, N]

        # 3) merge-maintain-split + broadcast
        share_mask, valid, shared_x, tstats = transition_stage(
            outs, g_shared, share_gamma
        )
        outs = apply_shared_broadcast(outs, share_mask, shared_x)
        ts_mask = ~share_mask  # [T, B, N] task-specific positions

        cv_total = jnp.asarray(0.0, jnp.float32)
        stats = dict(tstats)

        if not self.moe:
            mlp = MlpBlock(int(C * self.mlp_ratio), dtype=self.dtype,
                           use_pallas=self.use_pallas_dense_ffn, name="mlp")
            normed = norm2(outs.reshape(T * B, N, C))
            delta = mlp(normed.astype(self.dtype), train).reshape(T, B, N, C)
            outs = outs + delta * ts_mask[..., None].astype(delta.dtype)
            # shared dense FFN once on the representative
            sh = shared_x + mlp(
                norm2(shared_x).astype(self.dtype), train
            ).astype(jnp.float32)
            outs = apply_shared_broadcast(outs, share_mask, sh)
            return outs, share_mask, valid, {"cv_loss": cv_total,
                                             "stats": stats}

        # ===== MoE block =====
        E = self.num_experts_total()
        # per-task gates see raw tokens; only the shared single gate needs
        # the task embedding to distinguish tasks (reference token/
        # vision_transformer_moe.py:116-140: d_gate_no_emb vs d_gate_with_emb)
        d_gate = C if self.multi_gate else C + self.gate_task_specific_dim
        if self.multi_gate:
            w_gate_all = self.param(
                "w_gate",
                lambda k, s: jax.vmap(lambda kk: gate_init(kk, d_gate, E))(
                    jax.random.split(k, s[0])
                ),
                (self.num_tasks, d_gate, E),
            )
        else:
            w_gate_all = self.param(
                "w_gate", lambda k, s: gate_init(k, s[1], s[2])[None],
                (1, d_gate, E),
            )

        params = MoEFfnParams(
            w1=self.param("experts_w1", _expert_kernel_init,
                          (E, C, self.moe_hidden_dim)),
            b1=self.param("experts_b1", nn.initializers.zeros,
                          (E, self.moe_hidden_dim)),
            w2=self.param("experts_w2", _expert_kernel_init,
                          (E, self.moe_hidden_dim, C)),
            b2=self.param("experts_b2", nn.initializers.zeros, (E, C)),
        )
        cf = self.capacity_factor if train else self.eval_capacity_factor

        # exact dropped-slot accounting (see MoEMlp in vit_moe.py): per-shard
        # per-expert histogram of the final (compute-masked) routing ids vs
        # the static dispatch capacity; masked ids == E never count.
        from m3vit_tpu.moe.dispatch import compute_capacity

        ep_sz = 1
        if (self.mesh is not None and self.expert_axis is not None
                and self.expert_axis in self.mesh.shape):
            ep_sz = self.mesh.shape[self.expert_axis]
        n_shards = 1
        if ep_sz > 1:
            for ax in ("data", "expert"):
                n_shards *= self.mesh.shape.get(ax, 1)
        drop_cap = compute_capacity(B * N // n_shards, self.moe_top_k, E, cf)
        drop_overflow = jnp.asarray(0.0, jnp.float32)

        normed_all = norm2(outs.reshape(T * B, N, C)).reshape(T, B, N, C)
        ffn_fn = None
        if self.use_pallas_ffn:
            from m3vit_tpu.ops.expert_ffn import (
                make_pallas_ffn_fn, pallas_expert_ffn_available)
            if pallas_expert_ffn_available():
                ffn_fn = make_pallas_ffn_fn()
        # reuse cache (reference :673-812, dead plumbing there — reuse_bits
        # is always None upstream; here it is a live static-shape feature):
        # the FIRST task whose reuse bit is set computes the expert output
        # for a token and fills the cache; later reuse-tasks read it instead
        # of re-running gate+experts.  The cached value is the pre-residual
        # expert output (the reference caches mlp_drop(expert_out), :807-812).
        cache = jnp.zeros((B * N, C), jnp.float32)
        cache_valid = jnp.zeros((B * N,), bool)
        computed_tokens = jnp.asarray(0.0, jnp.float32)
        reused_tokens = jnp.asarray(0.0, jnp.float32)
        if reuse_bits is not None:
            assert reuse_bits.shape == (B, N), (
                f"reuse_bits must be [B, N] = {(B, N)} (one bitmask per "
                f"token incl. cls), got {reuse_bits.shape}"
            )
        reuse_flat = (reuse_bits.reshape(-1).astype(jnp.int32)
                      if reuse_bits is not None else None)
        # batched dispatch: the T per-task MoE passes are independent when
        # the reuse cache is off (reuse makes task t+1 read task t's expert
        # outputs), so fold them into ONE stacked dispatch + grouped GEMM
        # (moe_ffn_streams: per-(task, expert) capacity buckets, results
        # bitwise-identical to the loop) and batch the f32 gate-input cast
        # + logits into one einsum — the per-task noise draws stay separate
        # (clean_logits= path), preserving exact loop numerics.
        batched = self.batched_dispatch and reuse_flat is None
        clean_all = None
        if batched:
            inp_f32 = normed_all.reshape(T, B * N, C).astype(jnp.float32)
            if not self.multi_gate:
                te = jnp.broadcast_to(
                    task_emb[:, None, :],
                    (T, B * N, self.gate_task_specific_dim),
                ).astype(jnp.float32)
                inp_f32 = jnp.concatenate([inp_f32, te], axis=-1)
            clean_all = jnp.einsum(
                "tsc,tce->tse", inp_f32,
                jnp.broadcast_to(
                    w_gate_all.astype(jnp.float32), (T, d_gate, E)),
            )
        idx_list, gates_list = [], []
        for t in range(T):
            normed = normed_all[t]
            if batched:
                gate_inp, clean_t = None, clean_all[t]
            else:
                clean_t = None
                gate_inp = normed.reshape(-1, C).astype(jnp.float32)
                if not self.multi_gate:
                    te = jnp.broadcast_to(task_emb[t][None, :],
                                          (gate_inp.shape[0],
                                           self.gate_task_specific_dim))
                    gate_inp = jnp.concatenate([gate_inp, te], axis=-1)
            w_gate = w_gate_all[t if self.multi_gate else 0]
            r = jax.random.fold_in(rng, 100 + t) if rng is not None else None
            gate = noisy_vmoe_gate(
                gate_inp, w_gate, top_k=self.moe_top_k,
                noise_std=self.vmoe_noisy_std, train=train, rng=r,
                build_dense_gates=False, clean_logits=clean_t,
            )
            tsm = ts_mask[t].reshape(-1)  # [B*N]
            if reuse_flat is not None:
                task_in_reuse = ((reuse_flat >> t) & 1).astype(bool)
                can_reuse = task_in_reuse & tsm & cache_valid
                compute = tsm & ~can_reuse  # reference :749-752
            else:
                can_reuse = jnp.zeros_like(tsm)
                compute = tsm
            # TS/reuse-masked dispatch: non-compute tokens get an OOB expert
            # id and are dropped before they occupy capacity (the reference
            # gathers compute indices on the host; reference :743-801)
            idx = jnp.where(compute[:, None], gate.top_k_indices, E)
            hist = jax.nn.one_hot(
                idx.reshape(n_shards, (B * N // n_shards) * self.moe_top_k),
                E, dtype=jnp.float32,
            ).sum(axis=1)
            drop_overflow = drop_overflow + jnp.maximum(
                hist - drop_cap, 0.0
            ).sum()
            if batched:
                idx_list.append(idx)
                gates_list.append(gate.top_k_gates)
            else:
                # dispatch at the compute dtype (the FFN rounds its input to
                # self.dtype anyway — rounding BEFORE the gather moves half
                # the bytes; the f32 gate path above is unaffected)
                delta = moe_ffn(
                    normed.astype(self.dtype),
                    idx.reshape(B, N, self.moe_top_k),
                    gate.top_k_gates.reshape(B, N, self.moe_top_k), params,
                    mesh=self.mesh, expert_axis=self.expert_axis,
                    capacity_factor=cf, compute_dtype=self.dtype,
                    ffn_fn=ffn_fn,
                )
                dflat = delta.reshape(B * N, C).astype(jnp.float32)
                if reuse_flat is not None:
                    dflat = jnp.where(can_reuse[:, None], cache, dflat)
                    fill = task_in_reuse & tsm & ~cache_valid  # ref :746
                    cache = jnp.where(fill[:, None], dflat, cache)
                    cache_valid = cache_valid | fill
                used = dflat.reshape(B, N, C)
                outs = outs.at[t].add(
                    (used * ts_mask[t][..., None]).astype(outs.dtype))
            computed_tokens = computed_tokens + compute.sum()
            reused_tokens = reused_tokens + can_reuse.sum()

            # cv loss over computed tokens only (reference :795-801):
            # row-mask both the importance and the smooth load.  Masking the
            # top-k fields is identical to masking the dense [T, E] gates
            # (importance == one-hot accumulation of the top-k probs) and
            # skips the dense-gates scalar scatter entirely.
            cmf = compute.astype(jnp.float32)
            masked_gate = gate._replace(
                top_k_gates=gate.top_k_gates * cmf[:, None])
            cv_total = cv_total + moe_aux_loss(
                masked_gate, self.moe_top_k, E, train,
                row_mask=cmf,
            )
        if batched:
            delta_all = moe_ffn_streams(
                normed_all.reshape(T, B * N, C).astype(self.dtype),
                jnp.stack(idx_list),
                jnp.stack(gates_list),
                params,
                mesh=self.mesh, expert_axis=self.expert_axis,
                capacity_factor=cf, compute_dtype=self.dtype,
                ffn_fn=ffn_fn,
            )
            used_all = delta_all.reshape(T, B, N, C).astype(jnp.float32)
            outs = outs + (used_all * ts_mask[..., None]).astype(outs.dtype)
        stats["computed_tokens"] = computed_tokens
        stats["reused_tokens"] = reused_tokens
        stats["dropped_slot_fraction"] = drop_overflow / jnp.maximum(
            computed_tokens * self.moe_top_k, 1.0
        )
        stats["moe_stat_count"] = jnp.asarray(1.0, jnp.float32)

        # shared FFN once for shared positions (reference :1001-1014); its
        # hidden width follows the DENSE mlp_ratio, not the expert width
        # (reference TokenBlock: mlp_hidden_dim = dim * mlp_ratio)
        sh_hidden = int(C * self.mlp_ratio)
        sh_w1 = self.param("shared_ffn_fc1", trunc_normal_init,
                           (C, sh_hidden))
        sh_b1 = self.param("shared_ffn_b1", nn.initializers.zeros,
                           (sh_hidden,))
        sh_w2 = self.param("shared_ffn_fc2", trunc_normal_init,
                           (sh_hidden, C))
        sh_b2 = self.param("shared_ffn_b2", nn.initializers.zeros, (C,))
        # GEMMs in the model compute dtype (bf16 on TPU; f32 accumulation on
        # the MXU via preferred_element_type), gelu epilogue in f32 — the
        # previous all-f32 formulation materialized a f32 [T*B, N, 4C]
        # hidden (252 MB at the flagship token shapes) and ran f32 matmuls
        cd = self.dtype
        prec = "highest" if cd == jnp.float32 else None
        a_pre = jnp.einsum(
            "bnc,ch->bnh", norm2(shared_x).astype(cd), sh_w1.astype(cd),
            preferred_element_type=jnp.float32, precision=prec) + sh_b1
        a = gelu_exact(a_pre).astype(cd)
        sh = shared_x + (jnp.einsum(
            "bnh,hc->bnc", a, sh_w2.astype(cd),
            preferred_element_type=jnp.float32, precision=prec)
            + sh_b2).astype(shared_x.dtype)
        outs = apply_shared_broadcast(outs, share_mask, sh)

        return outs, share_mask, valid, {"cv_loss": cv_total, "stats": stats}

    def num_experts_total(self) -> int:
        return self.moe_experts


class TokenVisionTransformerMoE(nn.Module):
    """Per-task token streams with persistent sharing
    (reference token/vision_transformer_moe.py:1023-1397).

    Returns ({task_id: tokens [B, 1+N, C]}, total_aux_loss, stats)."""

    img_size: Tuple[int, int] = (512, 512)
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    moe_mlp_ratio: float = -1.0
    moe_experts: int = 16
    moe_top_k: int = 4
    vmoe_noisy_std: float = 1.0
    multi_gate: bool = False
    num_tasks: int = 2
    gate_task_specific_dim: int = 64
    share_gamma: float = 0.5
    bootstrap_share_gamma: float = 0.3
    bootstrap_first_moe: bool = True
    share_reg_lambda: float = 0.01
    use_task_conditioned_attn: bool = False
    attn_num_experts: int = 4
    attn_expert_top_k: int = 2
    branch_embed_dim: int = 32
    capacity_factor: float = 2.0
    eval_capacity_factor: float = 4.0
    use_pallas_ffn: bool = False
    use_pallas_dense_ffn: bool = False
    batched_dispatch: bool = False
    mesh: Any = None
    expert_axis: Optional[str] = None
    dtype: Dtype = jnp.float32
    use_checkpointing: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, task_id=None, train: bool = False,
                 reuse_bits: Optional[jnp.ndarray] = None,
                 share_temp: Optional[jnp.ndarray] = None):
        # reuse_bits [B, 1+N] int32: per-token task bitmask enabling the MoE
        # blocks' expert-output reuse cache (reference token/
        # vision_transformer_moe.py:673-812 — dead there, live here)
        B = x.shape[0]
        T = self.num_tasks
        num_patches = (self.img_size[0] // self.patch_size) * (
            self.img_size[1] // self.patch_size
        )
        tokens = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                            name="patch_embed")(x.astype(self.dtype))
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(self.dtype),
             tokens], axis=1,
        )
        pos = self.param("pos_embed", trunc_normal_init,
                         (1, num_patches + 1, self.embed_dim), jnp.float32)
        tokens = tokens + pos.astype(self.dtype)

        task_emb = TaskRepresentMlp(
            hidden_dim=int(self.gate_task_specific_dim),
            out_dim=self.gate_task_specific_dim, name="gate_task_represent",
        )(jnp.eye(T))  # [T, d_emb]

        outs = jnp.broadcast_to(tokens[None], (T,) + tokens.shape)

        moe_hidden = int(
            self.embed_dim
            * (self.moe_mlp_ratio if self.moe_mlp_ratio > 0 else self.mlp_ratio)
        )
        block_cls = TokenBlock
        if self.use_checkpointing:
            block_cls = nn.remat(TokenBlock, static_argnums=(3, 4))

        total_aux = jnp.asarray(0.0, jnp.float32)
        stats_acc: Dict = {}
        prev_share_mask = None
        first_moe = 1 if self.depth > 1 else None
        for i in range(self.depth):
            is_moe = i % 2 == 1
            gamma = self.share_gamma
            if (self.bootstrap_first_moe and is_moe and first_moe is not None
                    and i == first_moe):
                gamma = self.bootstrap_share_gamma
            outs, share_mask, valid, aux = block_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, moe=is_moe,
                moe_hidden_dim=moe_hidden, moe_experts=self.moe_experts,
                moe_top_k=self.moe_top_k, vmoe_noisy_std=self.vmoe_noisy_std,
                multi_gate=self.multi_gate, num_tasks=T,
                gate_task_specific_dim=self.gate_task_specific_dim,
                capacity_factor=self.capacity_factor,
                eval_capacity_factor=self.eval_capacity_factor,
                use_pallas_ffn=self.use_pallas_ffn,
                use_pallas_dense_ffn=self.use_pallas_dense_ffn,
                batched_dispatch=self.batched_dispatch,
                mesh=self.mesh, expert_axis=self.expert_axis,
                use_task_conditioned_attn=self.use_task_conditioned_attn,
                attn_num_experts=self.attn_num_experts,
                attn_expert_top_k=self.attn_expert_top_k,
                branch_embed_dim=self.branch_embed_dim,
                dtype=self.dtype, name=f"block_{i}",
            )(outs, task_emb, gamma, train, prev_share_mask, reuse_bits,
              share_temp)
            prev_share_mask = share_mask
            total_aux = total_aux + aux["cv_loss"]
            if train and self.share_reg_lambda > 0:
                total_aux = total_aux + sharing_regularization_loss(
                    share_mask, self.share_reg_lambda
                )
            for k, v in aux["stats"].items():
                stats_acc[k] = stats_acc.get(k, 0.0) + v

        return {t: outs[t] for t in range(T)}, total_aux, stats_acc


class TokenMultiTaskModel(nn.Module):
    """Per-task streams decoded by per-task heads (reference models.py:344-422,
    multi_gate path: one backbone pass produces all task streams)."""

    backbone: TokenVisionTransformerMoE
    decoders: Dict[str, nn.Module]
    tasks: Any

    def __call__(self, x, train: bool = False, single_task=None,
                 share_temp=None, reuse_bits=None):
        from m3vit_tpu.models.heads import resize_bilinear

        out_size = x.shape[1:3]
        streams, aux, stats = self.backbone(x, train=train,
                                            share_temp=share_temp,
                                            reuse_bits=reuse_bits)
        out = {}
        names = [single_task] if single_task is not None else list(self.tasks)
        for task in names:
            tid = list(self.tasks).index(task)
            out[task] = resize_bilinear(
                self.decoders[task](streams[tid], train=train), out_size
            )
        return out, aux, stats
