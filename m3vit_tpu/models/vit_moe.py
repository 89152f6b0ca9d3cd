"""MoE Vision Transformer backbone (flax.linen, TPU-native).

Equivalent capability to the reference's VisionTransformerMoE
(reference: models/moe/ckpt/vision_transformer_moe.py:564-886) with the
fastmoe CUDA runtime replaced by m3vit_tpu.moe (static-capacity dispatch +
all_to_all expert parallelism).

Parity invariants honored (SURVEY.md §Key invariants):
  * MoE blocks at odd indices only (even = dense)          (:643-657)
  * softmax-then-topk gating, raw-prob scores              (noisy_gate_vmoe)
  * cv_loss = cv²(importance)+cv²(load) per MoE block, train only (:538-542)
  * multi-gate = per-task routers (one backbone pass per task);
    task-conditioned = shared router + one-hot task MLP feature (:638-641,793-797)

TPU-first deltas (documented, not semantic):
  * routing capacity is static (capacity_factor); fastmoe is ragged
  * per-task gates are a stacked [num_tasks, d_gate, E] parameter indexed by
    a traced task_id — one compiled graph serves every task, and unused-gate
    grads are structurally zero (replacing the reference's DDP unused-param
    hack, custom_moe_layer.py:215-217)
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from m3vit_tpu.models.vit import (
    Attention,
    DenseBlock,
    MlpBlock,
    PatchEmbed,
    drop_path,
    gelu_exact,
    trunc_normal_init,
)
from m3vit_tpu.moe.dispatch import MoEFfnParams, moe_ffn
from m3vit_tpu.moe.gating import (
    GateOutput,
    gate_init,
    moe_aux_loss,
    moe_aux_loss_noisy,
    noisy_gate,
    noisy_gate_init,
    noisy_vmoe_gate,
)

Dtype = Any


# semantic-class -> expert-group table for sem_force routing
# (reference: custom_moe_layer.py:112-113 — 8 groups over NYUD-40 classes)
SEM_FORCE_GROUPS = [
    [0], [1, 17, 18, 19, 20], [2, 12, 13, 14, 15, 16], [3, 9, 10, 11],
    [4, 5], [6, 7, 8, 38], [21, 22, 23, 24, 25, 26, 39],
    [27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37],
]


def patch_majority_labels(sem: jnp.ndarray, patch_size: int,
                          num_classes: int = 41) -> jnp.ndarray:
    """Per-patch majority class with a 40% dominance threshold, else 255
    (reference get_groundtruth_sem, ckpt/vision_transformer_moe.py:762-778)."""
    if sem.ndim == 4:
        sem = sem[..., 0]
    B, H, W = sem.shape
    P = patch_size
    h, w = H // P, W // P
    patches = sem[:, : h * P, : w * P].reshape(B, h, P, w, P)
    patches = patches.transpose(0, 1, 3, 2, 4).reshape(B, h, w, P * P)
    labels = jnp.clip(patches.astype(jnp.int32), 0, num_classes)  # 255->clamp
    # count only non-255 pixels per class
    valid = patches != 255
    oh = jax.nn.one_hot(labels, num_classes + 1, dtype=jnp.int32)
    oh = oh * valid[..., None]
    counts = oh.sum(axis=3)  # [B, h, w, C+1]
    best = counts.argmax(-1)
    best_count = counts.max(-1)
    dominant = best_count > int(0.4 * P * P)
    return jnp.where(dominant, best, 255)


def build_sem_force_routing(
    patch_labels: jnp.ndarray,  # [B, n_patches] int (255 = no force)
    top_k: int,
    num_prefix: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map forced classes to expert pairs (group j -> experts [2j, 2j+1]
    tiled to top_k); prefix tokens never forced
    (reference custom_moe_layer.py:225-241)."""
    lut = np.full(256, -1, np.int32)
    for j, classes in enumerate(SEM_FORCE_GROUPS):
        for c in classes:
            lut[c] = j
    lut = jnp.asarray(lut)
    g = jnp.take(lut, jnp.clip(patch_labels, 0, 255))  # [B, n]
    forced = g >= 0
    base = jnp.where(forced, 2 * g, 0)
    pattern = jnp.asarray([i % 2 for i in range(top_k)], jnp.int32)
    idx = base[..., None] + pattern[None, None, :]  # [B, n, K]

    B, n = patch_labels.shape
    prefix_idx = jnp.zeros((B, num_prefix, top_k), jnp.int32)
    prefix_mask = jnp.zeros((B, num_prefix), bool)
    full_idx = jnp.concatenate([prefix_idx, idx], axis=1)
    full_mask = jnp.concatenate([prefix_mask, forced], axis=1)
    return full_idx, full_mask


def _regu_subimage_loss(patch_logits: jnp.ndarray, sub: int,
                        side_h: int = 0, side_w: int = 0) -> jnp.ndarray:
    """KL(subimage token routing || subimage top-2 consensus)
    (reference noisy_gate_vmoe.py:139-162).  patch_logits: [B, Np, E] on the
    (side_h, side_w) patch grid; grouped into sub x sub windows."""
    B, Np, E = patch_logits.shape
    if side_h <= 0 or side_w <= 0:
        side_h = int(round(Np ** 0.5))
        side_w = Np // side_h
    assert side_h * side_w == Np or side_h * side_w <= Np
    usable_h = (side_h // sub) * sub
    usable_w = (side_w // sub) * sub
    if usable_h == 0 or usable_w == 0:  # grid smaller than one subimage
        return jnp.asarray(0.0, jnp.float32)
    g = patch_logits[:, : side_h * side_w].reshape(B, side_h, side_w, E)
    g = g[:, :usable_h, :usable_w]
    gh, gw = usable_h // sub, usable_w // sub
    groups = g.reshape(B, gh, sub, gw, sub, E).transpose(0, 1, 3, 2, 4, 5)
    groups = groups.reshape(B, gh * gw, sub * sub, E).astype(jnp.float32)

    sums = groups.sum(axis=2)  # [B, G, E]
    top2 = jax.lax.top_k(sums, 2)[0][..., -1:]  # threshold = 2nd value
    gt_logit = jnp.where(sums >= top2, sums, 0.0)  # keep top-2 values
    p = jax.nn.softmax(gt_logit, axis=-1)[:, :, None, :]  # target
    logq = jax.nn.log_softmax(groups, axis=-1)
    logp = jnp.log(jnp.clip(p, 1e-12))
    kl = (p * (logp - logq)).sum(-1).mean(-1)  # batchmean over sub*sub tokens
    return kl.sum() / (B * gh * gw)


def _expert_kernel_init(key, shape, dtype=jnp.float32):
    """FMoELinear-style kaiming_uniform(a=sqrt(5)) on [E, d_in, d_out]:
    torch's 3-D fan_in = d_in * d_out, giving bound = 1/sqrt(d_in*d_out)."""
    fan = shape[1] * shape[2]
    bound = (1.0 / fan) ** 0.5
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class TaskRepresentMlp(nn.Module):
    """One-hot task -> gate feature (reference new_Mlp, vision_transformer_moe.py:263-281)."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, one_hot: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, kernel_init=trunc_normal_init, name="fc1")(
            one_hot
        )
        x = gelu_exact(x)
        x = nn.Dense(self.out_dim, kernel_init=trunc_normal_init, name="fc2")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class MoEMlp(nn.Module):
    """The FMoETransformerMLP equivalent: gate -> dispatch -> experts -> combine.

    reference: models/moe/ckpt/custom_moe_layer.py:66-321
    """

    num_experts: int
    d_hidden: int
    top_k: int = 2
    vmoe_noisy_std: float = 1.0
    multi_gate: bool = False
    num_tasks: int = 0
    gate_task_specific_dim: int = -1
    drop: float = 0.0
    capacity_factor: float = 2.0
    eval_capacity_factor: float = 4.0
    mesh: Any = None
    expert_axis: Optional[str] = None
    dtype: Dtype = jnp.float32
    # research knobs (reference custom_moe_layer.py:104-120, 221-246)
    expert_prune: bool = False
    prune_threshold: float = 0.1
    regu_experts_fromtask: bool = False
    num_experts_pertask: int = -1
    regu_sem: bool = False
    regu_sem_num_classes: int = 40
    regu_subimage: bool = False
    subimage_tokens: int = 5
    patch_grid: Tuple[int, int] = (0, 0)  # true (h, w) grid for regu_subimage
    gate_type: str = "noisy_vmoe"  # 'noisy_vmoe' | 'noisy' (gates.py:195-280)
    use_pallas_ffn: bool = False  # fused expert-FFN kernel (ops/expert_ffn.py)
    a2a_chunks: int = 1  # pipeline the EP exchange (dispatch.py n_chunks)
    # weight-only int8 expert banks (serving: halves expert HBM/artifact
    # bytes; inference-only — serve/quantize.py converts a float checkpoint)
    expert_weights_int8: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, N, C]
        task_id: Optional[jnp.ndarray],  # traced int32 scalar or None
        task_feature: Optional[jnp.ndarray],  # [task_dim] or None
        train: bool = False,
        expert_mask: Optional[jnp.ndarray] = None,  # [E] bool, select_idx-like
        sem_force_idx: Optional[jnp.ndarray] = None,  # [B, N, K] forced ids
        sem_force_mask: Optional[jnp.ndarray] = None,  # [B, N] bool
        gate_inp_tokens: Optional[jnp.ndarray] = None,  # [B, N, C_g] decoupled
        sem_patch: Optional[jnp.ndarray] = None,  # [B, n_patches] labels
    ):
        B, N, C = x.shape
        E = self.num_experts

        if gate_inp_tokens is not None:
            # decoupled gate features (reference custom_moe_layer.py:166-167)
            assert gate_inp_tokens.shape[:2] == (B, N), (
                f"gate_inp tokens {gate_inp_tokens.shape} misaligned with {x.shape}"
            )
            c_gate = gate_inp_tokens.shape[-1]
            gate_inp = gate_inp_tokens.reshape(-1, c_gate).astype(jnp.float32)
            d_gate = c_gate
        else:
            gate_inp = x.reshape(-1, C).astype(jnp.float32)
            d_gate = C
        if self.gate_task_specific_dim > 0 and not self.multi_gate:
            d_gate = d_gate + self.gate_task_specific_dim
        if task_feature is not None:
            assert not self.multi_gate
            feat = jnp.broadcast_to(
                task_feature[None, :], (gate_inp.shape[0], task_feature.shape[-1])
            )
            gate_inp = jnp.concatenate([gate_inp, feat], axis=-1)

        stacked = task_id is not None and getattr(task_id, "ndim", 0) == 1
        if stacked:
            assert self.multi_gate, "vector task_id requires multi_gate"
            assert not self.regu_experts_fromtask, (
                "stacked tasks unsupported with regu_experts_fromtask"
            )
            assert self.gate_type == "noisy_vmoe", (
                "stacked tasks only implemented for the vmoe gate"
            )
            assert task_id.shape[0] == B, (
                f"per-sample task_id {task_id.shape} vs batch {B}"
            )

        if self.multi_gate:
            assert self.num_tasks > 0, "multi_gate requires num_tasks"
            w_gate_shape = (self.num_tasks, d_gate, E)
            w_gate_all = self.param(
                "w_gate",
                lambda k, s: jax.vmap(lambda kk: gate_init(kk, d_gate, E))(
                    jax.random.split(k, s[0])
                ),
                w_gate_shape,
            )
            tid = jnp.clip(task_id, 0, self.num_tasks - 1)
            w_gate = jnp.take(w_gate_all, tid, axis=0)
        else:
            w_gate_shape = (1, d_gate, E)
            tid = 0
            w_gate = self.param(
                "w_gate",
                lambda k, s: gate_init(k, s[1], s[2])[None],
                w_gate_shape,
            )[0]

        # per-task expert window: gate over num_experts_pertask columns
        # starting at start_experts_id[task] (reference noisy_gate_vmoe:87-92
        # + idx offset custom_moe_layer:244-246)
        idx_offset = None
        if self.regu_experts_fromtask and task_id is not None:
            npt = self.num_experts_pertask
            assert npt > 0 and self.num_tasks > 1
            starts, s = [], 0
            for i in range(self.num_tasks):
                s = s + int(i * (E - npt) / (self.num_tasks - 1))
                starts.append(s)
            start = jnp.take(jnp.asarray(starts, jnp.int32),
                             jnp.clip(task_id, 0, self.num_tasks - 1))
            # reference slices w_gate[:, start:start+npt]; torch silently
            # NARROWS the window when start+npt > E (noisy_gate_vmoe.py:88).
            # Static shapes: slice at a clamped start and -inf-mask the
            # columns before the true start so the usable expert set matches
            # the reference's narrowed window exactly.
            start_c = jnp.minimum(start, E - npt)
            w_gate = jax.lax.dynamic_slice_in_dim(w_gate, start_c, npt, axis=1)
            col = jnp.arange(npt)
            window_mask = (start_c + col) >= start  # [npt] bool
            if expert_mask is None:
                expert_mask = window_mask
            else:
                expert_mask = jax.lax.dynamic_slice_in_dim(
                    expert_mask, start_c, npt
                ) & window_mask
            idx_offset = start_c

        rng = self.make_rng("gate_noise") if train else None
        if self.gate_type == "noisy":
            w_noise_all = self.param(
                "w_noise",
                lambda k, s: jax.vmap(lambda kk: gate_init(kk, s[1], s[2]))(
                    jax.random.split(k, s[0])
                ),
                w_gate_shape,
            )
            w_noise = (jnp.take(w_noise_all, tid, axis=0)
                       if self.multi_gate else w_noise_all[0])
            gate = noisy_gate(
                gate_inp, w_gate, w_noise, top_k=self.top_k, train=train,
                rng=rng, expert_mask=expert_mask,
            )
        else:
            pre_logits = None
            w_for_gate = w_gate
            if stacked:
                # per-row gate logits against each row's task router; the
                # gate weights are tiny ([B, d, E]) so this batched einsum
                # costs ~nothing next to the expert FFNs
                gi3 = gate_inp.reshape(B, N, d_gate)
                pre_logits = jnp.einsum(
                    "bnd,bde->bne", gi3, w_gate.astype(jnp.float32),
                    precision="highest",
                ).reshape(-1, E)
                w_for_gate = w_gate[0]
            gate = noisy_vmoe_gate(
                gate_inp,
                w_for_gate,
                top_k=self.top_k,
                noise_std=self.vmoe_noisy_std,
                train=train,
                rng=rng,
                expert_mask=expert_mask,
                build_dense_gates=False,
                clean_logits=pre_logits,
            )

        top_idx = gate.top_k_indices.reshape(B, N, self.top_k)
        top_gates = gate.top_k_gates.reshape(B, N, self.top_k)

        if self.expert_prune:
            # zero scores below threshold (reference custom_moe_layer:221-224)
            top_gates = jnp.where(top_gates > self.prune_threshold, top_gates,
                                  0.0)
        if idx_offset is not None:
            top_idx = top_idx + idx_offset
        if sem_force_idx is not None:
            # semantic-class forced routing (reference custom_moe_layer:225-241)
            m = sem_force_mask[..., None]
            top_idx = jnp.where(m, sem_force_idx, top_idx)
            top_gates = jnp.where(m, 0.5, top_gates)

        if self.expert_weights_int8:
            from m3vit_tpu.moe.dispatch import MoEFfnParamsQ

            params = MoEFfnParamsQ(
                w1=self.param("experts_w1_q", nn.initializers.zeros,
                              (E, C, self.d_hidden), jnp.int8),
                b1=self.param("experts_b1", nn.initializers.zeros,
                              (E, self.d_hidden)),
                w2=self.param("experts_w2_q", nn.initializers.zeros,
                              (E, self.d_hidden, C), jnp.int8),
                b2=self.param("experts_b2", nn.initializers.zeros, (E, C)),
                s1=self.param("experts_w1_scale", nn.initializers.ones,
                              (E, self.d_hidden)),
                s2=self.param("experts_w2_scale", nn.initializers.ones,
                              (E, C)),
            )
        else:
            params = MoEFfnParams(
                w1=self.param("experts_w1", _expert_kernel_init, (E, C, self.d_hidden)),
                b1=self.param("experts_b1", nn.initializers.zeros, (E, self.d_hidden)),
                w2=self.param("experts_w2", _expert_kernel_init, (E, self.d_hidden, C)),
                b2=self.param("experts_b2", nn.initializers.zeros, (E, C)),
            )

        drop_rng = None
        if self.drop > 0 and train:
            drop_rng = self.make_rng("dropout")
        cf = self.capacity_factor if train else self.eval_capacity_factor

        ffn_fn = None
        if self.use_pallas_ffn and not (self.drop > 0 and train):
            from m3vit_tpu.ops.expert_ffn import (
                make_pallas_ffn_fn, pallas_expert_ffn_available)
            if pallas_expert_ffn_available():
                ffn_fn = make_pallas_ffn_fn()

        out = moe_ffn(
            x,
            top_idx,
            top_gates,
            params,
            mesh=self.mesh,
            expert_axis=self.expert_axis,
            capacity_factor=cf,
            compute_dtype=self.dtype,
            dropout_rate=self.drop,
            dropout_rng=drop_rng,
            ffn_fn=ffn_fn,
            a2a_chunks=self.a2a_chunks,
        )

        # exact dropped-slot accounting for the static-capacity deviation
        # (the reference's ragged dispatch never drops,
        # ckpt/custom_moe_layer.py:263-265).  Dispatch capacity is per
        # (source shard, expert); recompute the per-shard per-expert
        # histogram of the FINAL routing ids exactly as moe_ffn shards them
        # (token axis split contiguously over the mesh batch axes), as a
        # one-hot reduce — no scatter.  Ids >= E (token-variant masking) are
        # intentional non-compute, not drops.
        from m3vit_tpu.moe.dispatch import compute_capacity

        T_all = B * N
        ep = 1
        if (self.mesh is not None and self.expert_axis is not None
                and self.expert_axis in self.mesh.shape):
            ep = self.mesh.shape[self.expert_axis]
        n_shards = 1
        if ep > 1:
            for ax in self.mesh.axis_names:  # matches moe_ffn token sharding
                n_shards *= self.mesh.shape.get(ax, 1)
        cap = compute_capacity(T_all // n_shards, self.top_k, E, cf)
        ids = jax.lax.stop_gradient(top_idx).reshape(
            n_shards, (T_all // n_shards) * self.top_k
        )
        shard_hist = jax.nn.one_hot(ids, E, dtype=jnp.float32).sum(axis=1)
        overflow = jnp.maximum(shard_hist - cap, 0.0).sum()
        drop_stats = {
            "dropped_slot_fraction": overflow / (T_all * self.top_k),
            "moe_stat_count": jnp.asarray(1.0, jnp.float32),
        }

        # auxiliary gate-logit regularizers (reference noisy_gate_vmoe.py
        # :95-162); both operate on patch-token clean logits
        regu = drop_stats
        if (self.regu_sem or self.regu_subimage) and sem_patch is not None:
            n_patch = sem_patch.shape[1]
            logits3d = gate.clean_logits.reshape(B, N, E)
            patch_logits = logits3d[:, N - n_patch:, :]  # drop prefix tokens
            if self.regu_sem:
                head = nn.Dense(self.regu_sem_num_classes, name="regu_sem_head")
                prior = head(patch_logits)  # [B, Np, num_class]
                lab = sem_patch.astype(jnp.int32)
                valid = lab != 255
                logp = jax.nn.log_softmax(prior, axis=-1)
                nll = -jnp.take_along_axis(
                    logp, jnp.where(valid, lab, 0)[..., None], axis=-1
                )[..., 0]
                regu["semregu_loss"] = jnp.where(valid, nll, 0.0).sum() /                     jnp.maximum(valid.sum(), 1)
            if self.regu_subimage:
                regu["regu_subimage_loss"] = _regu_subimage_loss(
                    patch_logits, self.subimage_tokens,
                    self.patch_grid[0], self.patch_grid[1],
                )

        return out.astype(x.dtype), gate, regu


class MoEBlock(nn.Module):
    """Transformer block with an MoE FFN (odd blocks in the reference).

    reference: ckpt/vision_transformer_moe.py:379-562 (Block with moe=True)
    """

    num_heads: int
    moe_hidden_dim: int
    moe_experts: int = 16
    moe_top_k: int = 4
    vmoe_noisy_std: float = 1.0
    multi_gate: bool = False
    num_tasks: int = 0
    gate_task_specific_dim: int = -1
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    capacity_factor: float = 2.0
    eval_capacity_factor: float = 4.0
    mesh: Any = None
    expert_axis: Optional[str] = None
    dtype: Dtype = jnp.float32
    expert_prune: bool = False
    prune_threshold: float = 0.1
    regu_experts_fromtask: bool = False
    num_experts_pertask: int = -1
    regu_sem: bool = False
    regu_subimage: bool = False
    patch_grid: Tuple[int, int] = (0, 0)
    gate_type: str = "noisy_vmoe"
    use_pallas_ffn: bool = False
    a2a_chunks: int = 1
    expert_weights_int8: bool = False
    # stacked multi-gate: task_id is a per-SAMPLE [B] vector (task-major
    # equal groups of cv_segments tasks); cv loss is computed per segment and
    # summed, matching the reference's one-backbone-pass-per-task loop
    # (models/models.py:299-320) exactly
    cv_segments: int = 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        task_id: Optional[jnp.ndarray],
        task_feature: Optional[jnp.ndarray],
        train: bool = False,
        expert_mask: Optional[jnp.ndarray] = None,
        sem_force_idx: Optional[jnp.ndarray] = None,
        sem_force_mask: Optional[jnp.ndarray] = None,
        gate_inp_tokens: Optional[jnp.ndarray] = None,
        sem_patch: Optional[jnp.ndarray] = None,
        stage: str = "full",  # "full" | "attn" | "moe": the attention
        # sublayer is task-INDEPENDENT (shared params, diverges only at the
        # MoE gate), so VisionTransformerMoE's shared_prefix mode runs
        # "attn" once and then "moe" per task.  Static (trace-time) arg.
    ) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
        dp_rng1 = dp_rng2 = None
        if self.drop_path_rate > 0 and train:
            # draw both up front in "full" mode to keep the rng stream
            # identical to the pre-split code
            if stage != "moe":
                dp_rng1 = self.make_rng("dropout")
            if stage != "attn":
                dp_rng2 = self.make_rng("dropout")

        if stage != "moe":
            h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name="norm1")(x)
            h = Attention(
                self.num_heads, self.qkv_bias, self.qk_scale, self.attn_drop,
                self.drop, dtype=self.dtype, mesh=self.mesh, name="attn",
            )(h.astype(self.dtype), train)
            x = x + drop_path(h, self.drop_path_rate, train, dp_rng1)
            if stage == "attn":
                return x, jnp.asarray(0.0, jnp.float32), {}

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        moe_out, gate, regu = MoEMlp(
            num_experts=self.moe_experts,
            d_hidden=self.moe_hidden_dim,
            top_k=self.moe_top_k,
            vmoe_noisy_std=self.vmoe_noisy_std,
            multi_gate=self.multi_gate,
            num_tasks=self.num_tasks,
            gate_task_specific_dim=self.gate_task_specific_dim,
            drop=self.drop,
            capacity_factor=self.capacity_factor,
            eval_capacity_factor=self.eval_capacity_factor,
            mesh=self.mesh,
            expert_axis=self.expert_axis,
            dtype=self.dtype,
            expert_prune=self.expert_prune,
            prune_threshold=self.prune_threshold,
            regu_experts_fromtask=self.regu_experts_fromtask,
            num_experts_pertask=self.num_experts_pertask,
            regu_sem=self.regu_sem,
            regu_subimage=self.regu_subimage,
            patch_grid=self.patch_grid,
            gate_type=self.gate_type,
            use_pallas_ffn=self.use_pallas_ffn,
            a2a_chunks=self.a2a_chunks,
            expert_weights_int8=self.expert_weights_int8,
            name="mlp",
        )(h.astype(self.dtype), task_id, task_feature, train,
          expert_mask, sem_force_idx, sem_force_mask, gate_inp_tokens,
          sem_patch)
        if self.drop > 0 and train:
            moe_out = nn.Dropout(self.drop, deterministic=False)(moe_out)
        x = x + drop_path(moe_out, self.drop_path_rate, train, dp_rng2)

        if self.gate_type == "noisy":
            cv_loss = moe_aux_loss_noisy(gate, self.moe_top_k,
                                         self.moe_experts, train)
        else:
            cv_loss = moe_aux_loss(gate, self.moe_top_k, self.moe_experts,
                                   train, segments=self.cv_segments)

        # MoE analysis stats (reference _ckpt_main_moe :461-480), detached.
        # Sparse top-k probs carry the same entropy/top1/hist information as
        # the dense [T, E] gates (zeros contribute nothing).
        from m3vit_tpu.moe.gating import gate_load_counts

        tk = jax.lax.stop_gradient(gate.top_k_gates.astype(jnp.float32))
        ent = -(tk * jnp.log(jnp.clip(tk, 1e-12))).sum(-1)
        load_hist = jax.lax.stop_gradient(gate_load_counts(gate))
        stats = {
            "gate_entropy_sum": ent.sum(),
            "top1_prob_sum": tk.max(-1).sum(),
            "gate_token_count": jnp.asarray(tk.shape[0], jnp.float32),
            "expert_load_hist": load_hist,
        }
        # High-frequency gate-internals dump, env-gated exactly like the
        # reference (M3VIT_LOG_GATE_INTERNALS, ckpt/noisy_gate_vmoe.py
        # :209-244): full-distribution entropy, pmax, and the mean count of
        # distinct expert GROUPS hit by the top-k (group_size=4 there).
        # Static python env check — no recompile unless the env changes.
        import os as _os

        if str(_os.environ.get("M3VIT_LOG_GATE_INTERNALS", "0")).lower() in (
                "1", "true", "yes", "on"):
            p_full = jax.lax.stop_gradient(
                jax.nn.softmax(gate.noisy_logits.astype(jnp.float32), -1))
            p_full = jnp.clip(p_full, 1e-9)
            group_size = 4 if self.moe_experts % 4 == 0 else 1
            if group_size == 1:
                # the reference asserts num_experts % 4 == 0
                # (noisy_gate_vmoe.py:213); with group_size=1 the
                # topk_group_count metric is NOT comparable to its logs
                import warnings

                warnings.warn(
                    f"M3VIT_LOG_GATE_INTERNALS: moe_experts="
                    f"{self.moe_experts} not divisible by 4; falling back "
                    "to group_size=1 — topk_group_count is not comparable "
                    "to reference logs (which assert divisibility)",
                    stacklevel=2)
            gids = jnp.sort(
                jax.lax.stop_gradient(gate.top_k_indices) // group_size, -1)
            distinct = (gids[:, 1:] != gids[:, :-1]).sum(-1) + 1
            stats["gate_full_entropy_sum"] = -(p_full * jnp.log(p_full)
                                               ).sum(-1).sum()
            stats["gate_pmax_sum"] = p_full.max(-1).sum()
            stats["topk_group_count_sum"] = distinct.astype(jnp.float32).sum()
        # `regu` carries the EXACT dropped_slot_fraction (per-shard overflow
        # of the final routing ids vs the dispatch capacity) + moe_stat_count
        # for normalizing after the block/task tree-sum; see MoEMlp.
        stats.update(regu)
        return x, cv_loss, stats


class _BlockPair(nn.Module):
    """One dense block followed by one MoE block — the reference's even/odd
    alternation unit (ckpt/vision_transformer_moe.py:643-657) packaged as a
    single module so ``VisionTransformerMoE.scan_blocks`` can ``nn.scan`` the
    whole depth.  Scanning emits the pair's XLA program (and its Pallas
    kernels: flash attention fwd+bwd, fused expert FFN) ONCE instead of
    depth/2 times, which is what makes flash attention compilable on the
    flagship (12 blocks x 5 task passes of inlined kernel instances
    otherwise).  drop_path is a per-block compile-time constant in the loop
    path, so the scan path requires drop_path_rate == 0."""

    num_heads: int
    mlp_ratio: float
    moe_hidden_dim: int
    moe_experts: int
    moe_top_k: int
    vmoe_noisy_std: float
    multi_gate: bool
    num_tasks: int
    gate_task_specific_dim: int
    qkv_bias: bool
    qk_scale: Optional[float]
    drop: float
    attn_drop: float
    capacity_factor: float
    eval_capacity_factor: float
    mesh: Any
    expert_axis: Optional[str]
    dtype: Dtype
    expert_prune: bool
    prune_threshold: float
    regu_experts_fromtask: bool
    num_experts_pertask: int
    regu_sem: bool
    regu_subimage: bool
    patch_grid: Tuple[int, int]
    gate_type: str
    use_pallas_ffn: bool
    a2a_chunks: int
    use_pallas_dense_ffn: bool
    use_pallas_ln_mlp: bool
    expert_weights_int8: bool
    cv_segments: int
    gate_input_ahead: bool

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        task_id: Optional[jnp.ndarray],
        task_feature: Optional[jnp.ndarray],
        train: bool = False,
        expert_mask: Optional[jnp.ndarray] = None,
        sem_force_idx: Optional[jnp.ndarray] = None,
        sem_force_mask: Optional[jnp.ndarray] = None,
        gate_inp_tokens: Optional[jnp.ndarray] = None,
        sem_patch: Optional[jnp.ndarray] = None,
    ):
        tokens = DenseBlock(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            drop=self.drop, attn_drop=self.attn_drop,
            drop_path_rate=0.0, dtype=self.dtype, mesh=self.mesh,
            use_pallas_ffn=self.use_pallas_dense_ffn,
            use_pallas_ln_mlp=self.use_pallas_ln_mlp,
            name="dense",
        )(tokens, train)
        tokens, cv, stats = MoEBlock(
            num_heads=self.num_heads, moe_hidden_dim=self.moe_hidden_dim,
            moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
            vmoe_noisy_std=self.vmoe_noisy_std, multi_gate=self.multi_gate,
            num_tasks=self.num_tasks,
            gate_task_specific_dim=self.gate_task_specific_dim,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            drop=self.drop, attn_drop=self.attn_drop, drop_path_rate=0.0,
            capacity_factor=self.capacity_factor,
            eval_capacity_factor=self.eval_capacity_factor,
            mesh=self.mesh, expert_axis=self.expert_axis, dtype=self.dtype,
            expert_prune=self.expert_prune,
            prune_threshold=self.prune_threshold,
            regu_experts_fromtask=self.regu_experts_fromtask,
            num_experts_pertask=self.num_experts_pertask,
            regu_sem=self.regu_sem, regu_subimage=self.regu_subimage,
            patch_grid=self.patch_grid, gate_type=self.gate_type,
            use_pallas_ffn=self.use_pallas_ffn,
            a2a_chunks=self.a2a_chunks,
            expert_weights_int8=self.expert_weights_int8,
            cv_segments=self.cv_segments,
            name="moe",
        )(tokens, task_id, task_feature, train, expert_mask,
          sem_force_idx, sem_force_mask,
          tokens if self.gate_input_ahead else gate_inp_tokens, sem_patch)
        return tokens, (cv, stats)


class VisionTransformerMoE(nn.Module):
    """MoE ViT backbone: even blocks dense, odd blocks MoE.

    Returns (tokens [B, 1+N, C], total_cv_loss, stats).
    reference: ckpt/vision_transformer_moe.py:564-886
    """

    img_size: Tuple[int, int] = (512, 512)
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    distilled: bool = False
    # MoE
    moe_mlp_ratio: float = -1.0  # expert hidden = embed_dim * this (<0 -> mlp_ratio)
    moe_experts: int = 16
    moe_top_k: int = 4
    vmoe_noisy_std: float = 1.0
    multi_gate: bool = False
    num_tasks: int = 0  # = gate_dim - embed_dim in reference configs
    gate_task_specific_dim: int = -1
    capacity_factor: float = 2.0
    eval_capacity_factor: float = 4.0
    # parallelism / precision
    mesh: Any = None
    expert_axis: Optional[str] = None
    dtype: Dtype = jnp.float32
    use_checkpointing: bool = True
    # research knobs
    expert_prune: bool = False
    prune_threshold: float = 0.1
    regu_experts_fromtask: bool = False
    num_experts_pertask: int = -1
    sem_force: bool = False
    regu_sem: bool = False
    regu_subimage: bool = False
    moe_gate_type: str = "noisy_vmoe"
    use_pallas_ffn: bool = False
    # pipeline the EP all_to_all exchange over groups of local experts
    # (moe/dispatch.py n_chunks); 1 = the monolithic fastmoe-style exchange
    a2a_chunks: int = 1
    # fused Pallas kernel for the DENSE blocks' MLPs too (vit.MlpBlock
    # use_pallas: hidden activation stays in VMEM, remat-style backward)
    use_pallas_dense_ffn: bool = False
    # fully fuse the dense blocks' LN+MLP+residual sublayer into one Pallas
    # kernel (ops/ln_mlp.py); supersedes use_pallas_dense_ffn at sites where
    # it is legal (no drop-path/dropout), falls back to it elsewhere
    use_pallas_ln_mlp: bool = False
    expert_weights_int8: bool = False
    # route with each MoE block's INPUT tokens instead of the post-norm2
    # stream (reference origin/vision_transformer_moe.py:276-277)
    gate_input_ahead: bool = False
    # lax.scan over (dense, MoE) block pairs instead of a python loop:
    # params stack to a [depth/2, ...] leading axis (convert with
    # utils.scan_params), the per-pair XLA program and its Pallas kernels
    # are emitted once, and compile time drops ~depth/2-fold.  Numerics are
    # identical in eval; in train the per-block dropout/gate-noise draws are
    # different-but-independent streams.  Requires even depth and
    # drop_path_rate == 0 (per-block rates are compile-time constants).
    scan_blocks: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, H, W, 3]
        task_id: Optional[jnp.ndarray] = None,
        train: bool = False,
        sem: Optional[jnp.ndarray] = None,  # [B, H, W(, 1)] semseg labels
        expert_mask: Optional[jnp.ndarray] = None,  # [E] bool routing mask
        gate_inp: Optional[jnp.ndarray] = None,  # [B, 1+N, C_g] decoupled gate
        stacked_tasks: bool = False,  # task_id is a [T] vector: one fused
        # pass computes every task's routing (returns [T*B, 1+N, C])
        shared_prefix: bool = False,  # task_id is a [T] vector: the
        # task-independent prefix (patch embed, pos embed, block_0 — the
        # task passes only diverge at block_1's per-task MoE gate) runs
        # ONCE at batch B, then blocks 1..depth-1 run per task in a python
        # loop (same working set as the sequential form, unlike
        # stacked_tasks).  Returns task-major [T*B, 1+N, C].  Exact
        # numerics vs the per-task loop when the prefix is deterministic;
        # guarded against train-mode dropout below.
    ) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
        B = x.shape[0]
        num_patches = (self.img_size[0] // self.patch_size) * (
            self.img_size[1] // self.patch_size
        )
        num_extra = 2 if self.distilled else 1

        tokens = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                            name="patch_embed")(x.astype(self.dtype))
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim), jnp.float32
        )
        extra = [jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(self.dtype)]
        if self.distilled:
            dist = self.param(
                "dist_token", trunc_normal_init, (1, 1, self.embed_dim), jnp.float32
            )
            extra.append(
                jnp.broadcast_to(dist, (B, 1, self.embed_dim)).astype(self.dtype)
            )
        tokens = jnp.concatenate(extra + [tokens], axis=1)
        pos = self.param(
            "pos_embed", trunc_normal_init,
            (1, num_patches + num_extra, self.embed_dim), jnp.float32,
        )
        tokens = tokens + pos.astype(self.dtype)

        # stacked multi-gate: embed ONCE at B (keeps the patch-embed conv
        # small), then tile the token stream task-major to [T*B, 1+N, C] and
        # hand each row its task's router.  One fused XLA graph replaces the
        # reference's sequential one-backbone-pass-per-task loop
        # (models/models.py:299-320); dropout/drop-path/gate noise are drawn
        # independently per row below, statistically matching the per-pass
        # draws of the sequential form.
        n_stack = 1
        if shared_prefix:
            assert task_id is not None and task_id.ndim == 1 and (
                self.multi_gate
                or (self.gate_task_specific_dim > 0 and self.num_tasks > 0)
            ), ("shared_prefix needs [T] task ids + per-task routing "
                "(multi_gate or the task-conditioned shared gate)")
            assert not stacked_tasks and not self.scan_blocks, \
                "shared_prefix is its own execution strategy"
            assert not (train and (self.drop_rate > 0
                                   or self.attn_drop_rate > 0)), \
                ("shared_prefix would share the prefix's dropout draws "
                 "across tasks; use the sequential loop when training "
                 "with dropout")
        if stacked_tasks:
            assert self.multi_gate and task_id is not None \
                and task_id.ndim == 1, "stacked_tasks needs multi_gate + [T] ids"
            n_stack = task_id.shape[0]
            tokens = jnp.broadcast_to(
                tokens[None], (n_stack,) + tokens.shape
            ).reshape((n_stack * B,) + tokens.shape[1:])
            task_id = jnp.repeat(task_id, B)  # per-sample, task-major
            B = n_stack * B

        if self.drop_rate > 0 and train:
            tokens = nn.Dropout(self.drop_rate, deterministic=False)(tokens)

        # task-conditioned shared router feature (reference :638-641, 793-797)
        task_feature = None
        if self.gate_task_specific_dim > 0 and not self.multi_gate:
            assert self.num_tasks > 0
            one_hot = jax.nn.one_hot(
                jnp.clip(task_id, 0, self.num_tasks - 1), self.num_tasks
            )
            task_feature = TaskRepresentMlp(
                hidden_dim=int(self.gate_task_specific_dim),
                out_dim=self.gate_task_specific_dim,
                name="gate_task_represent",
            )(one_hot)

        moe_hidden = int(
            self.embed_dim
            * (self.moe_mlp_ratio if self.moe_mlp_ratio > 0 else self.mlp_ratio)
        )
        dpr = [
            self.drop_path_rate * i / max(self.depth - 1, 1)
            for i in range(self.depth)
        ]

        dense_cls, moe_cls = DenseBlock, MoEBlock
        if self.use_checkpointing:
            dense_cls = nn.remat(DenseBlock, static_argnums=(2,))
            # 4 = train, 10 = stage (module instance is arg 0); both are
            # trace-time constants
            moe_cls = nn.remat(MoEBlock, static_argnums=(4, 10))

        # semantic-class forced routing (reference custom_moe_layer.py:225-241
        # over patch-majority labels, vision_transformer_moe.py:762-778)
        sem_force_idx = sem_force_mask = None
        sem_patch = None
        if (self.sem_force or self.regu_sem or self.regu_subimage) \
                and sem is not None:
            patch_sem = patch_majority_labels(sem, self.patch_size)  # [B,h,w]
            patch_sem = patch_sem.reshape(sem.shape[0], -1)
            sem_patch = patch_sem
            if self.sem_force:
                sem_force_idx, sem_force_mask = build_sem_force_routing(
                    patch_sem, self.moe_top_k, num_extra
                )
        if n_stack > 1:
            tile = lambda a: None if a is None else jnp.concatenate(  # noqa: E731
                [a] * n_stack, axis=0
            )
            sem_patch = tile(sem_patch)
            sem_force_idx = tile(sem_force_idx)
            sem_force_mask = tile(sem_force_mask)
            gate_inp = tile(gate_inp)

        if self.scan_blocks:
            if self.depth % 2 != 0:
                raise ValueError("scan_blocks requires even depth "
                                 f"(got {self.depth})")
            if self.drop_path_rate > 0:
                raise ValueError(
                    "scan_blocks requires drop_path_rate == 0: per-block "
                    "stochastic-depth rates are compile-time constants in "
                    "the loop path and cannot vary across scan iterations")
            pair_cls = _BlockPair
            if self.use_checkpointing:
                pair_cls = nn.remat(_BlockPair, static_argnums=(4,))
            scan_cls = nn.scan(
                pair_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True,
                            "gate_noise": True},
                in_axes=nn.broadcast,
                length=self.depth // 2,
            )
            tokens, (cvs, stats) = scan_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                moe_hidden_dim=moe_hidden, moe_experts=self.moe_experts,
                moe_top_k=self.moe_top_k, vmoe_noisy_std=self.vmoe_noisy_std,
                multi_gate=self.multi_gate, num_tasks=self.num_tasks,
                gate_task_specific_dim=self.gate_task_specific_dim,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                capacity_factor=self.capacity_factor,
                eval_capacity_factor=self.eval_capacity_factor,
                mesh=self.mesh, expert_axis=self.expert_axis,
                dtype=self.dtype, expert_prune=self.expert_prune,
                prune_threshold=self.prune_threshold,
                regu_experts_fromtask=self.regu_experts_fromtask,
                num_experts_pertask=self.num_experts_pertask,
                regu_sem=self.regu_sem, regu_subimage=self.regu_subimage,
                patch_grid=(self.img_size[0] // self.patch_size,
                            self.img_size[1] // self.patch_size),
                gate_type=self.moe_gate_type,
                use_pallas_ffn=self.use_pallas_ffn,
                a2a_chunks=self.a2a_chunks,
                use_pallas_dense_ffn=self.use_pallas_dense_ffn,
                use_pallas_ln_mlp=self.use_pallas_ln_mlp,
                expert_weights_int8=self.expert_weights_int8,
                cv_segments=n_stack,
                gate_input_ahead=self.gate_input_ahead,
                name="blocks_scan",
            )(tokens, task_id, task_feature, train, expert_mask,
              sem_force_idx, sem_force_mask, gate_inp, sem_patch)
            return tokens, jnp.sum(cvs), jax.tree.map(
                lambda a: a.sum(0), stats)

        # instantiate each block module ONCE (flax shares params across
        # calls), so shared_prefix below can re-apply blocks 1.. per task
        blocks: List[Any] = []
        for i in range(self.depth):
            if i % 2 == 0:
                blocks.append(dense_cls(
                    num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                    drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                    drop_path_rate=dpr[i], dtype=self.dtype, mesh=self.mesh,
                    use_pallas_ffn=self.use_pallas_dense_ffn,
                    use_pallas_ln_mlp=self.use_pallas_ln_mlp,
                    name=f"block_{i}",
                ))
            else:
                blocks.append(moe_cls(
                    num_heads=self.num_heads, moe_hidden_dim=moe_hidden,
                    moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                    vmoe_noisy_std=self.vmoe_noisy_std,
                    multi_gate=self.multi_gate,
                    num_tasks=self.num_tasks,
                    gate_task_specific_dim=self.gate_task_specific_dim,
                    qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                    drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                    drop_path_rate=dpr[i],
                    capacity_factor=self.capacity_factor,
                    eval_capacity_factor=self.eval_capacity_factor,
                    mesh=self.mesh, expert_axis=self.expert_axis,
                    dtype=self.dtype,
                    expert_prune=self.expert_prune,
                    prune_threshold=self.prune_threshold,
                    regu_experts_fromtask=self.regu_experts_fromtask,
                    num_experts_pertask=self.num_experts_pertask,
                    regu_sem=self.regu_sem,
                    regu_subimage=self.regu_subimage,
                    patch_grid=(self.img_size[0] // self.patch_size,
                                self.img_size[1] // self.patch_size),
                    gate_type=self.moe_gate_type,
                    use_pallas_ffn=self.use_pallas_ffn,
                    a2a_chunks=self.a2a_chunks,
                    expert_weights_int8=self.expert_weights_int8,
                    cv_segments=n_stack,
                    name=f"block_{i}",
                ))

        def run_blocks(tokens, tid, start, start_stage="full",
                       start_gate_inp=None, task_feature=task_feature):
            # start_stage="moe": `tokens` already went through block
            # `start`'s attention sublayer (shared_prefix ran it once);
            # start_gate_inp carries that block's ORIGINAL input for
            # gate_input_ahead, which routes on pre-attention tokens.
            total_cv = jnp.asarray(0.0, jnp.float32)
            agg = None
            for i in range(start, self.depth):
                if i % 2 == 0:
                    tokens = blocks[i](tokens, train)
                else:
                    stage = start_stage if i == start else "full"
                    gi = tokens if self.gate_input_ahead else gate_inp
                    if stage == "moe" and self.gate_input_ahead:
                        gi = start_gate_inp
                    tokens, cv, stats = blocks[i](
                        tokens, tid, task_feature, train, expert_mask,
                        sem_force_idx, sem_force_mask, gi, sem_patch,
                        stage)
                    total_cv = total_cv + cv
                    agg = (
                        stats
                        if agg is None
                        else jax.tree.map(lambda a, b: a + b, agg, stats)
                    )
            return tokens, total_cv, agg

        if shared_prefix:
            # leading dense blocks are task-independent in multi_gate mode
            # (the passes diverge only at the first per-task MoE gate):
            # run them once at B, then fan out per task.  The shared
            # block_0 gradient is the sum of the task branches' cotangents
            # — identical to the per-task loop, where autodiff sums the
            # shared parameters' contributions across passes.
            n_prefix = 0
            while n_prefix < self.depth and n_prefix % 2 == 0:
                tokens = blocks[n_prefix](tokens, train)
                n_prefix += 1
            # the first MoE block's ATTENTION sublayer is still
            # task-independent (shared params; the passes diverge only at
            # its gate) — run it once too, unless train-time drop-path
            # would share its residual mask across tasks (dpr[0]=0 always,
            # but dpr[n_prefix]>0 when drop_path_rate>0)
            start_stage, start_gate_inp = "full", None
            if n_prefix < self.depth and not (
                    train and self.drop_path_rate > 0):
                if self.gate_input_ahead:
                    start_gate_inp = tokens  # block input routes the gate
                tokens, _, _ = blocks[n_prefix](
                    tokens, None, None, train, expert_mask,
                    sem_force_idx, sem_force_mask, None, sem_patch, "attn")
                start_stage = "moe"
            feats, cvs, aggs = [], [], []
            for t in range(task_id.shape[0]):
                # task-conditioned shared gate: task_feature is [T, dim]
                # (TaskRepresentMlp over the [T] one-hots) — hand each
                # branch its own row
                tf = task_feature if task_feature is None \
                    else task_feature[t]
                f, cv, agg = run_blocks(tokens, task_id[t], n_prefix,
                                        start_stage, start_gate_inp,
                                        task_feature=tf)
                feats.append(f)
                cvs.append(cv)
                if agg is not None:
                    aggs.append(agg)
            stats_out = {}
            if aggs:
                stats_out = jax.tree.map(
                    lambda *a: sum(a[1:], a[0]), *aggs)
            return (jnp.concatenate(feats, axis=0),
                    sum(cvs[1:], cvs[0]), stats_out)

        tokens, total_cv, agg = run_blocks(tokens, task_id, 0)
        stats_out = agg if agg is not None else {}
        return tokens, total_cv, stats_out
