"""Numerical parity against the ACTUAL reference implementation.

Imports /root/reference/models/moe/ckpt/noisy_gate_vmoe.py read-only (with a
minimal stub for the fastmoe BaseGate dependency) and compares its outputs
with m3vit_tpu.moe.gating on identical weights/inputs.  Skipped when the
reference tree is not mounted.
"""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF_GATE = "/root/reference/models/moe/ckpt/noisy_gate_vmoe.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_GATE), reason="reference tree not mounted"
)


def _load_reference_gate():
    # minimal fmoe stub: BaseGate only holds num_expert/world/tot_expert + loss
    if "fmoe" not in sys.modules:
        fmoe = types.ModuleType("fmoe")
        gates = types.ModuleType("fmoe.gates")
        base = types.ModuleType("fmoe.gates.base_gate")

        class BaseGate(torch.nn.Module):
            def __init__(self, num_expert, world_size):
                super().__init__()
                self.world_size = world_size
                self.num_expert = num_expert
                self.tot_expert = world_size * num_expert
                self.loss = None

            def set_loss(self, loss):
                self.loss = loss

        base.BaseGate = BaseGate
        gates.base_gate = base
        fmoe.gates = gates
        sys.modules["fmoe"] = fmoe
        sys.modules["fmoe.gates"] = gates
        sys.modules["fmoe.gates.base_gate"] = base

    spec = importlib.util.spec_from_file_location("ref_noisy_gate_vmoe",
                                                  REF_GATE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gate_matches_reference_implementation():
    """Eval-mode (deterministic) outputs of the reference NoisyGate_VMoE vs
    our noisy_vmoe_gate, same weights, same inputs."""
    from m3vit_tpu.moe.gating import noisy_vmoe_gate

    ref_mod = _load_reference_gate()
    T, d, E, K = 64, 32, 16, 4
    rng = np.random.RandomState(0)
    x = rng.randn(T, d).astype(np.float32)
    w = rng.randn(d, E).astype(np.float32) * 0.1

    gate = ref_mod.NoisyGate_VMoE(d, E, 1, top_k=K, noise_std=1.0)
    gate.eval()
    with torch.no_grad():
        gate.w_gate.copy_(torch.from_numpy(w))
        (ref_idx, ref_scores), ref_clean, ref_noisy, ref_std, ref_top, \
            ref_gates = gate(torch.from_numpy(x))

    ours = noisy_vmoe_gate(jnp.asarray(x), jnp.asarray(w), top_k=K,
                           noise_std=1.0, train=False)

    np.testing.assert_array_equal(np.asarray(ours.top_k_indices),
                                  ref_idx.numpy())
    np.testing.assert_allclose(np.asarray(ours.top_k_gates),
                               ref_scores.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.clean_logits),
                               ref_clean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.top_logits),
                               ref_top.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.gates), ref_gates.numpy(),
                               atol=1e-6)
    assert float(ours.noise_stddev) == float(ref_std)


def test_gate_train_no_noise_matches_reference():
    """training=True but no_noise: both paths stay deterministic and equal
    (covers the reference's noise_stddev *= 0 branch)."""
    from m3vit_tpu.moe.gating import noisy_vmoe_gate

    ref_mod = _load_reference_gate()
    T, d, E, K = 32, 16, 8, 2
    rng = np.random.RandomState(1)
    x = rng.randn(T, d).astype(np.float32)
    w = rng.randn(d, E).astype(np.float32) * 0.2

    gate = ref_mod.NoisyGate_VMoE(d, E, 1, top_k=K, noise_std=1.0,
                                  no_noise=True)
    gate.train()
    with torch.no_grad():
        gate.w_gate.copy_(torch.from_numpy(w))
        (ref_idx, ref_scores), *_ , ref_gates = gate(torch.from_numpy(x))

    ours = noisy_vmoe_gate(jnp.asarray(x), jnp.asarray(w), top_k=K,
                           noise_std=1.0, train=True, no_noise=True,
                           rng=jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(ours.top_k_indices),
                                  ref_idx.numpy())
    np.testing.assert_allclose(np.asarray(ours.gates), ref_gates.numpy(),
                               atol=1e-6)


def _install_full_fmoe_stub():
    """Pure-torch CPU stand-ins for the fastmoe pieces FMoETransformerMLP
    touches (fmoe.layers.FMoE/_fmoe_general_global_forward, FMoELinear,
    unused comm functions).  Behavior matches fastmoe's single-worker path:
    tokens are repeated top_k times, stably sorted by expert id, run through
    per-expert linears segment-wise, and scattered back."""
    import math

    _load_reference_gate()  # ensures base fmoe/gates modules exist

    fmoe = sys.modules["fmoe"]
    if hasattr(fmoe, "layers"):
        return

    layers = types.ModuleType("fmoe.layers")
    linear = types.ModuleType("fmoe.linear")
    functions = types.ModuleType("fmoe.functions")

    class FMoELinear(torch.nn.Module):
        def __init__(self, num_expert, in_feat, out_feat, bias=True, rank=0):
            super().__init__()
            self.weight = torch.nn.Parameter(
                torch.empty(num_expert, out_feat, in_feat)
            )
            torch.nn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
            self.bias = (torch.nn.Parameter(torch.zeros(num_expert, out_feat))
                         if bias else None)

        def forward(self, inp, fwd_expert_count):
            out, s = [], 0
            for e, c in enumerate(fwd_expert_count.tolist()):
                if c == 0:
                    continue
                seg = inp[s:s + c] @ self.weight[e].t()
                if self.bias is not None:
                    seg = seg + self.bias[e]
                out.append(seg)
                s += c
            if not out:
                return inp.new_zeros(0, self.weight.shape[1])
            return torch.cat(out, 0)

    def _fmoe_general_global_forward(inp, gate_idx, expert_fn, num_expert,
                                     world_size, **kw):
        T, k = gate_idx.shape
        flat = gate_idx.reshape(-1)
        pos = torch.argsort(flat, stable=True)
        counts = torch.bincount(flat, minlength=num_expert)
        x = inp[pos // k]
        y = expert_fn(x, counts)
        out = torch.empty_like(y)
        out[pos] = y
        return out

    class FMoE(torch.nn.Module):
        def __init__(self, num_expert=32, d_model=1024, gate=None,
                     world_size=1, top_k=2, moe_group=None, **kw):
            super().__init__()
            self.num_expert = num_expert
            self.d_model = d_model
            self.world_size = world_size
            self.top_k = top_k
            self.slice_size = 1
            self.slice_rank = 0
            self.slice_group = None
            self.moe_group = moe_group
            self.mask = None
            self.mask_dict = None
            self.gate_hook = None

        def expert_fn(self, inp, fwd_expert_count):
            return self.experts(inp, fwd_expert_count)

        def mark_parallel_comm(self, expert_dp_comm="none"):
            pass

    def _unused(*a, **kw):  # comm primitives never hit on 1 worker
        raise NotImplementedError

    layers.FMoE = FMoE
    layers._fmoe_general_global_forward = _fmoe_general_global_forward
    linear.FMoELinear = FMoELinear
    functions.prepare_forward = _unused
    functions.ensure_comm = _unused
    functions.MOEScatter = _unused
    functions.MOEGather = _unused
    functions.AllGather = _unused
    functions.Slice = _unused
    fmoe.layers = layers
    fmoe.linear = linear
    fmoe.functions = functions
    sys.modules["fmoe.layers"] = layers
    sys.modules["fmoe.linear"] = linear
    sys.modules["fmoe.functions"] = functions
    sys.modules["fmoe.gates"].NaiveGate = object


def _load_reference_moe_layer():
    _install_full_fmoe_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib

    return importlib.import_module("models.moe.ckpt.custom_moe_layer")


def test_full_moe_layer_matches_reference():
    """The COMPLETE MoE FFN layer (gate -> ragged dispatch -> per-expert
    GELU MLP -> raw-prob combine) vs the reference FMoETransformerMLP running
    on the actual reference code (fastmoe replaced by a faithful pure-torch
    single-worker stub).  Capacity is generous so our static dispatch drops
    nothing, matching fastmoe's ragged semantics exactly."""
    from m3vit_tpu.moe.dispatch import MoEFfnParams, moe_ffn
    from m3vit_tpu.moe.gating import noisy_vmoe_gate

    cml = _load_reference_moe_layer()
    # class identity matters: FMoETransformerMLP checks `gate == NoisyGate_VMoE`
    # against ITS import of models.moe.ckpt.noisy_gate_vmoe
    import importlib

    ngv = importlib.import_module("models.moe.ckpt.noisy_gate_vmoe")

    B, N, d, h, E, K = 2, 33, 32, 48, 8, 2
    torch.manual_seed(0)
    layer = cml.FMoETransformerMLP(
        num_expert=E, d_model=d, d_gate=d, d_hidden=h,
        gate=ngv.NoisyGate_VMoE, world_size=1, top_k=K,
        vmoe_noisy_std=1.0,
    )
    layer.eval()

    rng = np.random.RandomState(3)
    x = rng.randn(B, N, d).astype(np.float32)
    with torch.no_grad():
        ref_out, *_ = layer(torch.from_numpy(x))
    ref_out = ref_out.numpy()

    # same weights into our functional layer
    w_gate = layer.gate.w_gate.detach().numpy()          # [d, E]
    w1 = layer.experts.htoh4.weight.detach().numpy()     # [E, h, d]
    b1 = layer.experts.htoh4.bias.detach().numpy()       # [E, h]
    w2 = layer.experts.h4toh.weight.detach().numpy()     # [E, d, h]
    b2 = layer.experts.h4toh.bias.detach().numpy()       # [E, d]

    gate = noisy_vmoe_gate(
        jnp.asarray(x.reshape(-1, d)), jnp.asarray(w_gate), top_k=K,
        noise_std=1.0, train=False,
    )
    params = MoEFfnParams(
        w1=jnp.asarray(w1.transpose(0, 2, 1)),
        b1=jnp.asarray(b1),
        w2=jnp.asarray(w2.transpose(0, 2, 1)),
        b2=jnp.asarray(b2),
    )
    ours = moe_ffn(
        jnp.asarray(x),
        gate.top_k_indices.reshape(B, N, K),
        gate.top_k_gates.reshape(B, N, K),
        params,
        capacity_factor=float(E),  # no drops -> ragged-equivalent
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out.reshape(B, N, d),
                               atol=2e-5)


def _load_reference_backbone_module():
    import importlib

    _install_full_fmoe_stub()
    if "timm" not in sys.modules:  # only lecun_normal_ is imported
        timm = types.ModuleType("timm")
        tl = types.ModuleType("timm.layers")
        tl.lecun_normal_ = lambda t, *a, **kw: t
        timm.layers = tl
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = tl
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return importlib.import_module("models.moe.ckpt.vision_transformer_moe")


def _convert_backbone_sd(sd, depth, multi_gate_tasks=0):
    """Reference ckpt VisionTransformerMoE state dict -> our flax param tree
    (production converter; promoted to torch_interop in round 4)."""
    from m3vit_tpu.utils.torch_interop import reference_backbone_sd_to_params

    return reference_backbone_sd_to_params(sd, depth, multi_gate_tasks)


def _backbone_parity_case(ref_kwargs, our_kwargs, task_ids=(None,),
                          multi_gate_tasks=0, seed=1, atol=5e-5):
    """Build both backbones (tiny), convert weights, compare eval forwards
    for each task id."""
    from m3vit_tpu.models.vit_moe import VisionTransformerMoE
    from m3vit_tpu.utils.torch_interop import merge_into

    vtm = _load_reference_backbone_module()
    IMG, d, depth, heads, E, K = 64, 64, 2, 4, 8, 2
    torch.manual_seed(seed)
    ref = vtm.VisionTransformerMoE(
        model_name="tiny_test", img_size=IMG, patch_size=16, embed_dim=d,
        depth=depth, num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
        drop_rate=0.0, moe_mlp_ratio=1, moe_experts=E, moe_top_k=K,
        world_size=1, moe_gate_type="noisy_vmoe", vmoe_noisy_std=1.0,
        random_init=True, use_checkpointing=False, **ref_kwargs,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = _convert_backbone_sd(sd, depth, multi_gate_tasks)

    ours = VisionTransformerMoE(
        img_size=(IMG, IMG), patch_size=16, embed_dim=d, depth=depth,
        num_heads=heads, mlp_ratio=4.0, qkv_bias=True, moe_mlp_ratio=1.0,
        moe_experts=E, moe_top_k=K, capacity_factor=8.0,
        eval_capacity_factor=8.0, dtype=jnp.float32,
        use_checkpointing=False, **our_kwargs,
    )
    rng = np.random.RandomState(7)
    x = rng.randn(2, IMG, IMG, 3).astype(np.float32)
    tid0 = None if task_ids[0] is None else jnp.asarray(task_ids[0])
    template = ours.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        jnp.asarray(x), task_id=tid0, train=False,
    )["params"]
    merged, missing = merge_into(template, params)
    assert not missing, f"unconverted params: {missing}"

    for tid in task_ids:
        with torch.no_grad():
            ref_out, _ = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             task_id=tid)
        out, _, _ = ours.apply(
            {"params": merged}, jnp.asarray(x),
            task_id=None if tid is None else jnp.asarray(tid), train=False,
        )
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                                   atol=atol, err_msg=f"task_id={tid}")


def test_full_backbone_matches_reference():
    """WHOLE-BACKBONE forward parity: the reference VisionTransformerMoE
    (actual code, fastmoe stubbed) vs our flax backbone with converted
    weights — eval mode, single gate, tiny config."""
    _backbone_parity_case({}, {"multi_gate": False, "num_tasks": 0})


def test_full_backbone_multi_gate_matches_reference():
    """Multi-gate backbone: per-task routers (reference gate ModuleList,
    custom_moe_layer.py:145-150) — every task pass must match."""
    T = 3
    _backbone_parity_case(
        {"multi_gate": True, "gate_dim": 64 + T},
        {"multi_gate": True, "num_tasks": T},
        task_ids=(0, 1, 2), multi_gate_tasks=T, seed=2,
    )


def test_full_backbone_gate_input_ahead_matches_reference():
    """gate_input_ahead: routing on block-INPUT tokens (reference
    Block.forward, vision_transformer_moe.py)."""
    _backbone_parity_case(
        {"gate_input_ahead": True},
        {"multi_gate": False, "num_tasks": 0, "gate_input_ahead": True},
        seed=3,
    )


def test_full_backbone_task_conditioned_matches_reference():
    """Task-conditioned shared gate: one-hot -> TaskRepresentMlp feature
    concatenated to the gate input (reference :793-797)."""
    T, gtsd = 3, 16
    # the reference derives num_tasks = gate_dim - embed_dim (:638-641)
    _backbone_parity_case(
        {"gate_task_specific_dim": gtsd, "gate_dim": 64 + T},
        {"multi_gate": False, "num_tasks": T,
         "gate_task_specific_dim": gtsd},
        task_ids=(0, 2), seed=4,
    )


def test_token_backbone_matches_reference():
    """Token persistent-sharing backbone parity vs the ACTUAL reference
    TokenVisionTransformerMoE (eval): per-task attention, shareability ->
    merge-maintain-split transition, shared broadcast, TS-only dense/MoE,
    shared FFN.  The reference's eval-mode gumbel_softmax still SAMPLES
    noise (shareability.py:78) — we pin it to its zero-noise limit
    (hard argmax), which is exactly our deterministic eval rule."""
    import importlib

    _install_full_fmoe_stub()
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tl = types.ModuleType("timm.layers")
        tl.lecun_normal_ = lambda t, *a, **kw: t
        timm.layers = tl
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = tl
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    vtm = importlib.import_module("models.moe.token.vision_transformer_moe")
    shr = importlib.import_module("models.moe.token.shareability")

    # deterministic gumbel: zero-noise limit (hard one-hot of logits)
    class _DetF:
        def __getattr__(self, name):
            return getattr(torch.nn.functional, name)

        @staticmethod
        def gumbel_softmax(logits, tau=1.0, hard=False, dim=-1):
            idx = logits.argmax(dim=dim, keepdim=True)
            return torch.zeros_like(logits).scatter_(dim, idx, 1.0)

    old_F = shr.F
    shr.F = _DetF()
    # upstream bug: token _compute_cv_loss calls noise_stddev.mean() on a
    # python float (noisy_gate_vmoe.py:50 returns raw*training) and crashes
    # on every forward; neutralize it (we compare token streams, not aux)
    old_cv = vtm.TokenBlock._compute_cv_loss
    vtm.TokenBlock._compute_cv_loss = (
        lambda self, gate_info: torch.tensor(0.0)
    )
    try:
        vtm.load_pretrained_pos_emb = lambda *a, **kw: None
        vtm.default_cfgs = {"tiny": {}}

        T, IMG, d, depth, heads, E, K, gtsd = 2, 64, 64, 2, 4, 8, 2, 64
        torch.manual_seed(5)
        ref = vtm.TokenVisionTransformerMoE(
            model_name="tiny", img_size=(IMG, IMG), patch_size=16,
            embed_dim=d, depth=depth, num_heads=heads, mlp_ratio=4.0,
            qkv_bias=True, drop_rate=0.0, moe_mlp_ratio=1, moe_experts=E,
            moe_top_k=K, world_size=1, vmoe_noisy_std=1.0,
            gate_task_specific_dim=gtsd, multi_gate=True, num_tasks=T,
            random_init=True, share_gamma=0.5, bootstrap_share_gamma=0.3,
        )
        ref.eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        from m3vit_tpu.utils.torch_interop import (
            reference_token_sd_to_params,
        )

        params = reference_token_sd_to_params(sd, depth, multi_gate_tasks=T)

        from m3vit_tpu.models.token_moe import TokenVisionTransformerMoE
        from m3vit_tpu.utils.torch_interop import merge_into

        ours = TokenVisionTransformerMoE(
            img_size=(IMG, IMG), patch_size=16, embed_dim=d, depth=depth,
            num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
            moe_mlp_ratio=1.0, moe_experts=E, moe_top_k=K, multi_gate=True,
            num_tasks=T, gate_task_specific_dim=gtsd, share_gamma=0.5,
            bootstrap_share_gamma=0.3, capacity_factor=8.0,
            eval_capacity_factor=8.0, dtype=jnp.float32,
            use_checkpointing=False,
        )
        rng = np.random.RandomState(9)
        x = rng.randn(2, IMG, IMG, 3).astype(np.float32)
        template = ours.init(
            {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
            jnp.asarray(x), train=False,
        )["params"]
        merged, missing = merge_into(template, params)
        assert not missing, f"unconverted params: {missing}"

        with torch.no_grad():
            ref_outs, _ = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        outs, _, stats = ours.apply({"params": merged}, jnp.asarray(x),
                                    train=False)
        for t in range(T):
            np.testing.assert_allclose(
                np.asarray(outs[t]), ref_outs[t].numpy(), atol=5e-5,
                err_msg=f"task stream {t}",
            )
    finally:
        shr.F = old_F
        vtm.TokenBlock._compute_cv_loss = old_cv


def test_task_conditioned_attention_matches_reference():
    """Relation-conditioned task attention (§4.2-4.4) vs the ACTUAL reference
    TaskConditionedAttention: branch embeddings, per-head sparse relation
    routers, expert QKV pools, private/neutral branch composition."""
    import importlib

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    rca = importlib.import_module(
        "models.moe.token.relation_conditioned_attention"
    )
    from m3vit_tpu.models.relation_attention import TaskConditionedAttention

    T, B, N, D, H, E, K, bed = 3, 2, 9, 32, 4, 4, 2, 16
    torch.manual_seed(6)
    ref = rca.TaskConditionedAttention(
        dim=D, num_heads=H, num_experts_per_head=E, expert_top_k=K,
        num_tasks=T, branch_embed_dim=bed, qkv_bias=True,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params = {
        "branch_embed": sd["branch_embed.embed.weight"],
        "router_w": np.stack([
            np.stack([sd[f"routers_{p}.{h}.linear.weight"].T
                      for h in range(H)])
            for p in ("q", "k", "v")
        ]),
        "router_b": np.stack([
            np.stack([sd[f"routers_{p}.{h}.linear.bias"] for h in range(H)])
            for p in ("q", "k", "v")
        ]),
        "expert_pools": np.stack([
            np.stack([sd[f"expert_pools.{h}.expert_{p}"] for h in range(H)])
            for p in ("q", "k", "v")
        ]),
        "q_bias": sd["q_bias"].reshape(H, D // H),
        "k_bias": sd["k_bias"].reshape(H, D // H),
        "v_bias": sd["v_bias"].reshape(H, D // H),
        "proj": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
    }

    # shared bits: position j shared by tasks {0,1} for j<3, {all} for j==3,
    # none elsewhere; participant streams must agree at shared positions
    rng = np.random.RandomState(11)
    streams = rng.randn(T, B, N, D).astype(np.float32)
    bits = np.zeros((B, N), np.int64)
    bits[:, :3] = 0b011
    bits[:, 3] = (1 << T) - 1
    shared_vals = rng.randn(B, N, D).astype(np.float32)
    for t in range(T):
        m = ((bits >> t) & 1).astype(bool)
        streams[t][m] = shared_vals[m]

    with torch.no_grad():
        ref_outs = ref(
            {t: torch.from_numpy(streams[t]) for t in range(T)},
            torch.from_numpy(bits),
        )

    ours = TaskConditionedAttention(
        num_tasks=T, dim=D, num_heads=H, attn_num_experts=E,
        attn_expert_top_k=K, branch_embed_dim=bed, dtype=jnp.float32,
    )
    share_mask = jnp.asarray(
        np.stack([((bits >> t) & 1).astype(bool) for t in range(T)])
    )
    template = ours.init(jax.random.key(0), jnp.asarray(streams), share_mask)
    from m3vit_tpu.utils.torch_interop import merge_into

    merged, missing = merge_into(template["params"], params)
    assert not missing, f"unconverted params: {missing}"
    out = ours.apply({"params": merged}, jnp.asarray(streams), share_mask)

    for t in range(T):
        np.testing.assert_allclose(
            np.asarray(out[t]), ref_outs[t].numpy(), atol=5e-5,
            err_msg=f"task {t}",
        )

    # probe: no shared positions (the first-block path).  The REFERENCE
    # crashes here — _task_branch_attention reads proj_cache[(t+1, 0)]
    # which is only built when has_neutral (relation_conditioned_attention
    # .py:558-566 vs :327) — i.e. upstream task-conditioned attention can
    # never run its first block as written.  Ours handles it.
    with pytest.raises(KeyError):
        with torch.no_grad():
            ref({t: torch.from_numpy(streams[t]) for t in range(T)}, None)
    out0 = ours.apply({"params": merged}, jnp.asarray(streams), None)
    for t in range(T):
        assert np.isfinite(np.asarray(out0[t])).all()


def test_cross_stitch_and_nddr_units_match_reference():
    """Cross-stitch and NDDR fusion units vs the actual reference modules
    (pure torch, CPU) with copied weights."""
    import importlib

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    cs = importlib.import_module("models.mtl_methods.cross_stitch")
    nd = importlib.import_module("models.mtl_methods.nddr_cnn")
    from m3vit_tpu.models.mtl_methods import CrossStitchUnit, NDDRLayer

    tasks = ["semseg", "depth"]
    C, B, Hh, Ww = 6, 2, 5, 5
    rng = np.random.RandomState(21)
    feats = {t: rng.randn(B, C, Hh, Ww).astype(np.float32) for t in tasks}

    # ---- cross-stitch ----
    torch.manual_seed(7)
    ref_cs = cs.CrossStitchUnit(tasks, C, alpha=0.9, beta=0.1)
    # randomize away from the symmetric init so the test is non-trivial
    with torch.no_grad():
        for ti in tasks:
            for tj in tasks:
                ref_cs.cross_stitch_unit[ti][tj].param.copy_(
                    torch.from_numpy(rng.randn(C).astype(np.float32))
                )
    with torch.no_grad():
        ref_out = ref_cs({t: torch.from_numpy(feats[t]) for t in tasks})

    ours_cs = CrossStitchUnit(tuple(tasks), C)
    nhwc = {t: jnp.asarray(feats[t].transpose(0, 2, 3, 1)) for t in tasks}
    v = ours_cs.init(jax.random.key(0), nhwc)
    params = {
        f"stitch_{ti}_{tj}":
            ref_cs.cross_stitch_unit[ti][tj].param.detach().numpy()
        for ti in tasks for tj in tasks
    }
    out = ours_cs.apply({"params": params}, nhwc)
    for t in tasks:
        np.testing.assert_allclose(
            np.asarray(out[t]).transpose(0, 3, 1, 2), ref_out[t].numpy(),
            atol=1e-5, err_msg=f"cross-stitch {t}",
        )

    # ---- NDDR ----
    torch.manual_seed(8)
    ref_nd = nd.NDDRLayer(tasks, C, alpha=0.9, beta=0.1)
    with torch.no_grad():
        for t in tasks:
            ref_nd.layer[t][0].weight.copy_(torch.from_numpy(
                rng.randn(C, C * len(tasks), 1, 1).astype(np.float32) * 0.2
            ))
    ref_nd.eval()
    with torch.no_grad():
        ref_out = ref_nd({t: torch.from_numpy(feats[t]) for t in tasks})

    ours_nd = NDDRLayer(tuple(tasks), C)
    vn = ours_nd.init(jax.random.key(1), nhwc, train=False)
    pn = dict(vn["params"])
    for t in tasks:
        w = ref_nd.layer[t][0].weight.detach().numpy()  # [C, C*T, 1, 1]
        pn[f"conv_{t}"] = {"kernel": w.transpose(2, 3, 1, 0)}
        pn[f"bn_{t}"] = {
            "scale": ref_nd.layer[t][1].weight.detach().numpy(),
            "bias": ref_nd.layer[t][1].bias.detach().numpy(),
        }
    out = ours_nd.apply(
        {"params": pn, "batch_stats": vn["batch_stats"]}, nhwc, train=False
    )
    for t in tasks:
        np.testing.assert_allclose(
            np.asarray(out[t]).transpose(0, 3, 1, 2), ref_out[t].numpy(),
            atol=1e-5, err_msg=f"nddr {t}",
        )


def _install_mmcv_stub():
    if "mmcv" in sys.modules:
        return
    mmcv = types.ModuleType("mmcv")
    cnn = types.ModuleType("mmcv.cnn")
    cutils = types.ModuleType("mmcv.cnn.utils")
    winit = types.ModuleType("mmcv.cnn.utils.weight_init")
    runner = types.ModuleType("mmcv.runner")

    def build_norm_layer(cfg, num_features):
        return "bn", torch.nn.BatchNorm2d(num_features)

    def normal_init(module, mean=0, std=1, bias=0):
        torch.nn.init.normal_(module.weight, mean, std)
        if hasattr(module, "bias") and module.bias is not None:
            torch.nn.init.constant_(module.bias, bias)

    def _identity_decorator(*a, **kw):
        def wrap(fn):
            return fn
        return wrap

    cnn.build_norm_layer = build_norm_layer
    winit.normal_init = normal_init
    cutils.weight_init = winit
    cnn.utils = cutils
    runner.auto_fp16 = _identity_decorator
    runner.force_fp32 = _identity_decorator
    mmcv.cnn = cnn
    mmcv.runner = runner
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.cnn"] = cnn
    sys.modules["mmcv.cnn.utils"] = cutils
    sys.modules["mmcv.cnn.utils.weight_init"] = winit
    sys.modules["mmcv.runner"] = runner


def test_pup_head_matches_reference():
    """PUP decoder head (4x conv-BN-relu + 2x bilinear, reference
    heads/vit_up_head.py) vs the actual reference code with copied weights."""
    import importlib

    _install_mmcv_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    vuh = importlib.import_module("models.heads.vit_up_head")
    from m3vit_tpu.models.heads import VisionTransformerUpHead

    IMG, d, ncls = 64, 32, 5
    torch.manual_seed(10)
    ref = vuh.VisionTransformerUpHead(
        img_size=(IMG, IMG), patch_size=16, embed_dim=d, num_conv=4,
        num_upsampe_layer=4, p={}, in_channels=d, channels=256,
        num_classes=ncls,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params = {"norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}}
    for i in range(5):
        params[f"conv_{i}"] = {
            "kernel": sd[f"conv_{i}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"conv_{i}.bias"],
        }
    bstats = {}
    for i in range(4):
        params[f"syncbn_fc_{i}"] = {
            "scale": sd[f"syncbn_fc_{i}.weight"],
            "bias": sd[f"syncbn_fc_{i}.bias"],
        }
        bstats[f"syncbn_fc_{i}"] = {
            "mean": sd[f"syncbn_fc_{i}.running_mean"],
            "var": sd[f"syncbn_fc_{i}.running_var"],
        }

    rng = np.random.RandomState(13)
    tokens = rng.randn(2, 1 + 16, d).astype(np.float32)  # cls + 4x4 grid
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(tokens))

    ours = VisionTransformerUpHead(
        img_size=(IMG, IMG), patch_size=16, embed_dim=d, num_classes=ncls,
        dtype=jnp.float32,
    )
    out = ours.apply({"params": params, "batch_stats": bstats},
                     jnp.asarray(tokens), train=False)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=1e-4
    )


def test_resnet_dilated_matches_reference():
    """ResNet-18 + ResnetDilated(8) (reference backbones/resnet.py +
    resnet_dilated.py) vs our stage-wise flax ResNet with copied weights —
    including the asymmetric per-conv dilations _nostride_dilate produces in
    the first block of each dilated stage."""
    import importlib

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    rres = importlib.import_module("models.backbones.resnet")
    rdil = importlib.import_module("models.backbones.resnet_dilated")
    from m3vit_tpu.models.resnet import resnet18

    torch.manual_seed(12)
    ref = rdil.ResnetDilated(rres.resnet18(pretrained=False), dilate_scale=8)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def conv(k):
        return {"kernel": sd[k + ".weight"].transpose(2, 3, 1, 0)}

    def bn(k):
        return (
            {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]},
            {"mean": sd[k + ".running_mean"], "var": sd[k + ".running_var"]},
        )

    params = {"conv1": conv("conv1")}
    bstats = {}
    params["bn1"], bstats["bn1"] = bn("bn1")
    for si in range(4):
        for bi in range(2):  # resnet18: 2 blocks per stage
            pre = f"layer{si+1}.{bi}"
            name = f"layer{si+1}_{bi}"
            blk_p = {
                "conv1": conv(pre + ".conv1"),
                "conv2": conv(pre + ".conv2"),
            }
            blk_s = {}
            blk_p["bn1"], blk_s["bn1"] = bn(pre + ".bn1")
            blk_p["bn2"], blk_s["bn2"] = bn(pre + ".bn2")
            if pre + ".downsample.0.weight" in sd:
                blk_p["ds_conv"] = conv(pre + ".downsample.0")
                blk_p["ds_bn"], blk_s["ds_bn"] = bn(pre + ".downsample.1")
            params[name] = blk_p
            bstats[name] = blk_s

    ours = resnet18(dilated=True)
    rng = np.random.RandomState(17)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    template = ours.init(jax.random.key(0), jnp.asarray(x), train=False)
    from m3vit_tpu.utils.torch_interop import merge_into

    merged, missing = merge_into(template["params"], params)
    assert not missing, f"unconverted: {missing}"

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = ours.apply({"params": merged, "batch_stats": bstats},
                     jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=2e-4
    )


def test_deeplab_aspp_head_matches_reference():
    """DeepLab/ASPP head (reference heads/aspp.py) vs ours, copied weights."""
    import importlib

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    raspp = importlib.import_module("models.heads.aspp")
    from m3vit_tpu.models.cnn_heads import DeepLabHead

    Cin, ncls = 16, 5
    torch.manual_seed(14)
    ref = raspp.DeepLabHead(Cin, ncls)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def conv(k):
        d = {"kernel": sd[k + ".weight"].transpose(2, 3, 1, 0)}
        if k + ".bias" in sd:
            d["bias"] = sd[k + ".bias"]
        return d

    def bn(k):
        return (
            {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]},
            {"mean": sd[k + ".running_mean"], "var": sd[k + ".running_var"]},
        )

    aspp_p, aspp_s = {}, {}
    aspp_p["conv0"] = conv("0.convs.0.0")
    aspp_p["bn0"], aspp_s["bn0"] = bn("0.convs.0.1")
    for i in range(3):
        aspp_p[f"conv{i+1}"] = conv(f"0.convs.{i+1}.0")
        aspp_p[f"bn{i+1}"], aspp_s[f"bn{i+1}"] = bn(f"0.convs.{i+1}.1")
    aspp_p["pool_conv"] = conv("0.convs.4.1")
    aspp_p["pool_bn"], aspp_s["pool_bn"] = bn("0.convs.4.2")
    aspp_p["proj_conv"] = conv("0.project.0")
    aspp_p["proj_bn"], aspp_s["proj_bn"] = bn("0.project.1")

    params = {"aspp": aspp_p, "conv": conv("1"), "classifier": conv("4")}
    params["bn"], bn_s = bn("2")
    bstats = {"aspp": aspp_s, "bn": bn_s}

    rng = np.random.RandomState(19)
    x = rng.randn(2, 16, 7, 9).astype(np.float32)  # NCHW
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    out = DeepLabHead(num_classes=ncls, dtype=jnp.float32).apply(
        {"params": params, "batch_stats": bstats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=2e-5
    )


def test_mobilenetv3_matches_reference():
    """MobileNetV3-Large backbone vs the reference (backbones/mobilenetv3.py)
    with copied weights — covers the expanded-block BN->SE->act ordering and
    the _make_divisible SE widths."""
    import importlib

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    rmn = importlib.import_module("models.backbones.mobilenetv3")
    from m3vit_tpu.models.mobilenetv3 import LARGE, MobileNetV3

    torch.manual_seed(15)
    ref = rmn.mobilenetv3_large()
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def conv(k):
        d = {"kernel": sd[k + ".weight"].transpose(2, 3, 1, 0)}
        if k + ".bias" in sd:
            d["bias"] = sd[k + ".bias"]
        return d

    def dwconv(k):
        # torch depthwise [C,1,kh,kw] -> flax grouped kernel [kh,kw,1,C]
        return {"kernel": sd[k + ".weight"].transpose(2, 3, 1, 0)}

    def bn(k):
        return (
            {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]},
            {"mean": sd[k + ".running_mean"], "var": sd[k + ".running_var"]},
        )

    def se(k):
        # torch Linear [h, C] / [C, h] -> 1x1 conv kernels
        return {
            "fc1": {"kernel": sd[k + ".fc.0.weight"].T[None, None],
                    "bias": sd[k + ".fc.0.bias"]},
            "fc2": {"kernel": sd[k + ".fc.2.weight"].T[None, None],
                    "bias": sd[k + ".fc.2.bias"]},
        }

    params = {"stem": conv("features.0.0")}
    bstats = {}
    params["stem_bn"], bstats["stem_bn"] = bn("features.0.1")
    in_ch = 16
    for i, cfg in enumerate(LARGE):
        pre = f"features.{i + 1}.conv"
        name = f"block{i}"
        bp, bs = {}, {}
        if cfg.expand == in_ch:  # no expansion: dw,bn,act,SE,pw,bn
            bp["dw"] = dwconv(pre + ".0")
            bp["dw_bn"], bs["dw_bn"] = bn(pre + ".1")
            if cfg.se:
                bp["se"] = se(pre + ".3")
            bp["project"] = conv(pre + ".4")
            bp["project_bn"], bs["project_bn"] = bn(pre + ".5")
        else:  # pw,bn,act,dw,bn,SE,act,pw,bn
            bp["expand"] = conv(pre + ".0")
            bp["expand_bn"], bs["expand_bn"] = bn(pre + ".1")
            bp["dw"] = dwconv(pre + ".3")
            bp["dw_bn"], bs["dw_bn"] = bn(pre + ".4")
            if cfg.se:
                bp["se"] = se(pre + ".5")
            bp["project"] = conv(pre + ".7")
            bp["project_bn"], bs["project_bn"] = bn(pre + ".8")
        params[name] = bp
        bstats[name] = bs
        in_ch = cfg.out
    params["head_conv"] = conv("conv.0")
    params["head_bn"], bstats["head_bn"] = bn("conv.1")

    rng = np.random.RandomState(23)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    ours = MobileNetV3(variant="large", dtype=jnp.float32)
    template = ours.init(jax.random.key(0), jnp.asarray(x), train=False)
    from m3vit_tpu.utils.torch_interop import merge_into

    merged, missing = merge_into(template["params"], params)
    assert not missing, f"unconverted: {missing}"
    out = ours.apply({"params": merged, "batch_stats": bstats},
                     jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=2e-4
    )


def test_hrnet_w18_matches_reference():
    """HRNet-W18-small-v2 vs the reference seg_hrnet.py (loaded with its own
    model_info/hrnet_w18.yml config) with copied weights — stem, bottleneck
    stage 1, transitions, all multi-resolution modules and SUM fusions."""
    import importlib

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if not hasattr(np, "int"):  # reference uses np.int (removed in numpy>=1.24)
        np.int = int
    shr = importlib.import_module("models.backbones.seg_hrnet")
    from m3vit_tpu.models.hrnet import hrnet_w18

    torch.manual_seed(16)
    ref = shr.hrnet_w18(pretrained=False)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def conv(k):
        return {"kernel": sd[k + ".weight"].transpose(2, 3, 1, 0)}

    def bn(k):
        return (
            {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]},
            {"mean": sd[k + ".running_mean"], "var": sd[k + ".running_var"]},
        )

    def block(pre, bottleneck=False):
        p, s = {}, {}
        convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1",
                                                                "conv2")
        for c in convs:
            p[c] = conv(f"{pre}.{c}")
            p["bn" + c[-1]], s["bn" + c[-1]] = bn(f"{pre}.bn{c[-1]}")
        if f"{pre}.downsample.0.weight" in sd:
            p["ds_conv"] = conv(f"{pre}.downsample.0")
            p["ds_bn"], s["ds_bn"] = bn(f"{pre}.downsample.1")
        return p, s

    params, bstats = {}, {}
    params["stem_conv1"] = conv("conv1")
    params["stem_bn1"], bstats["stem_bn1"] = bn("bn1")
    params["stem_conv2"] = conv("conv2")
    params["stem_bn2"], bstats["stem_bn2"] = bn("bn2")
    for b in range(2):
        params[f"layer1_{b}"], bstats[f"layer1_{b}"] = block(
            f"layer1.{b}", bottleneck=True
        )

    # transitions: ours trans{nb}_{i} <- reference transition{nb-1}.{i}
    # (existing branch with changed channels: Sequential(conv,bn,relu);
    #  new branch: Sequential(Sequential(conv,bn,relu)))
    for nb, tname in ((2, "transition1"), (3, "transition2"),
                      (4, "transition3")):
        for i in range(nb):
            flat = f"{tname}.{i}.0"
            nested = f"{tname}.{i}.0.0"
            if nested + ".weight" in sd:
                params[f"trans{nb}_{i}_conv"] = conv(nested)
                params[f"trans{nb}_{i}_bn"], bstats[f"trans{nb}_{i}_bn"] = \
                    bn(f"{tname}.{i}.0.1")
            elif flat + ".weight" in sd:
                params[f"trans{nb}_{i}_conv"] = conv(flat)
                params[f"trans{nb}_{i}_bn"], bstats[f"trans{nb}_{i}_bn"] = \
                    bn(f"{tname}.{i}.1")

    # stages: ours stage{nb}_module{m}
    for nb, sname, n_mod in ((2, "stage2", 1), (3, "stage3", 3),
                             (4, "stage4", 2)):
        for m in range(n_mod):
            mp, ms = {}, {}
            for br in range(nb):
                for blk in range(2):
                    mp[f"branch{br}_block{blk}"], ms[f"branch{br}_block{blk}"] \
                        = block(f"{sname}.{m}.branches.{br}.{blk}")
            for i in range(nb):
                for j in range(nb):
                    if j > i:
                        base = f"{sname}.{m}.fuse_layers.{i}.{j}"
                        mp[f"fuse{i}_{j}_conv"] = conv(base + ".0")
                        mp[f"fuse{i}_{j}_bn"], ms[f"fuse{i}_{j}_bn"] = \
                            bn(base + ".1")
                    elif j < i:
                        for k in range(i - j):
                            base = f"{sname}.{m}.fuse_layers.{i}.{j}.{k}"
                            mp[f"fuse{i}_{j}_ds{k}_conv"] = conv(base + ".0")
                            (mp[f"fuse{i}_{j}_ds{k}_bn"],
                             ms[f"fuse{i}_{j}_ds{k}_bn"]) = bn(base + ".1")
            params[f"stage{nb}_module{m}"] = mp
            bstats[f"stage{nb}_module{m}"] = ms

    rng = np.random.RandomState(29)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    ours = hrnet_w18()
    template = ours.init(jax.random.key(0), jnp.asarray(x), train=False)
    from m3vit_tpu.utils.torch_interop import merge_into

    merged, missing = merge_into(template["params"], params)
    assert not missing, f"unconverted: {missing}"
    outs = ours.apply({"params": merged, "batch_stats": bstats},
                      jnp.asarray(x), train=False)
    assert len(outs) == len(ref_outs) == 4
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(outs[i]).transpose(0, 3, 1, 2), ref_outs[i].numpy(),
            atol=5e-4, err_msg=f"stream {i}",
        )


def test_mixture_gated_block_matches_reference():
    """DeepMoE channel-gated bottleneck (reference MixtureBottleBlock,
    backbones/resnet.py:347-512, inner=True kk=2 as mixture_inner_resnet_50
    uses it): inner convs widened 2x, per-task relu gates applied after bn1
    and bn2 only."""
    import importlib

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    rres = importlib.import_module("models.backbones.resnet")
    from m3vit_tpu.models.mixture import MixtureBottleneck

    tasks = ["semseg", "depth"]
    inplanes, planes, idim = 16, 8, 10
    torch.manual_seed(18)
    ds = torch.nn.Sequential(
        torch.nn.Conv2d(inplanes, planes * 4, 1, bias=False),
        torch.nn.BatchNorm2d(planes * 4),
    )
    ref = rres.MixtureBottleBlock(
        inplanes, planes, tasks, expand=2, input_dim=idim, stride=1,
        downsample=ds, init="u,-0.5,0.5", inner=True,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def conv(k):
        return {"kernel": sd[k + ".weight"].transpose(2, 3, 1, 0)}

    def bn(k):
        return (
            {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]},
            {"mean": sd[k + ".running_mean"], "var": sd[k + ".running_var"]},
        )

    params, bstats = {}, {}
    for c in ("conv1", "conv2", "conv3"):
        params[c] = conv(c)
        params["bn" + c[-1]], bstats["bn" + c[-1]] = bn("bn" + c[-1])
    params["ds_conv"] = conv("downsample.0")
    params["ds_bn"], bstats["ds_bn"] = bn("downsample.1")
    for t in tasks:
        for g in range(3):
            params[f"gate_{t}_{g}"] = {
                "kernel": sd[f"gate{t}_{g}.weight"].T
            }

    rng = np.random.RandomState(31)
    x = rng.randn(2, inplanes, 6, 6).astype(np.float32)
    yv = rng.randn(2, idim).astype(np.float32)
    ours = MixtureBottleneck(
        planes=planes, tasks=tuple(tasks), input_dim=idim, downsample=True,
        expand=2.0, inner=True, dtype=jnp.float32,
    )
    for task in tasks:
        with torch.no_grad():
            ref_out, masks, costs, *_ = ref(
                torch.from_numpy(x), torch.from_numpy(yv), task
            )
        out, density = ours.apply(
            {"params": params, "batch_stats": bstats},
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(yv), task,
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(),
            atol=2e-5, err_msg=task,
        )
        assert len(masks) == 2  # inner=True: only two gates applied


def test_mtan_units_match_reference():
    """MTAN attention layer + refinement block vs the reference modules."""
    import importlib

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    rmtan = importlib.import_module("models.mtl_methods.mtan")
    from m3vit_tpu.models.mtl_methods import AttentionLayer, RefinementBlock

    Cin, Cmid, Cout = 12, 3, 12
    torch.manual_seed(20)
    ref_att = rmtan.AttentionLayer(Cin, Cmid, Cout)
    ref_att.eval()
    sd = {k: v.detach().numpy() for k, v in ref_att.state_dict().items()}

    def conv(k):
        d = {"kernel": sd[k + ".weight"].transpose(2, 3, 1, 0)}
        if k + ".bias" in sd:
            d["bias"] = sd[k + ".bias"]
        return d

    def bn(k):
        return (
            {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]},
            {"mean": sd[k + ".running_mean"], "var": sd[k + ".running_var"]},
        )

    params = {"conv1": conv("0"), "conv2": conv("3")}
    bstats = {}
    params["bn1"], bstats["bn1"] = bn("1")
    params["bn2"], bstats["bn2"] = bn("4")

    rng = np.random.RandomState(33)
    x = rng.randn(2, Cin, 6, 6).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_att(torch.from_numpy(x))
    out = AttentionLayer(Cmid, Cout).apply(
        {"params": params, "batch_stats": bstats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=1e-5
    )

    # refinement block = one torchvision-style Bottleneck with 1x1 downsample
    torch.manual_seed(21)
    ref_ref = rmtan.RefinementBlock(Cin, 16)
    ref_ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref_ref.state_dict().items()}
    bp, bs = {}, {}
    for c in ("conv1", "conv2", "conv3"):
        bp[c] = conv(f"0.{c}")
        bp["bn" + c[-1]], bs["bn" + c[-1]] = bn(f"0.bn{c[-1]}")
    bp["ds_conv"] = conv("0.downsample.0")
    bp["ds_bn"], bs["ds_bn"] = bn("0.downsample.1")
    with torch.no_grad():
        ref_out = ref_ref(torch.from_numpy(x))
    out = RefinementBlock(16).apply(
        {"params": {"bottleneck": bp}, "batch_stats": {"bottleneck": bs}},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=1e-5
    )


def test_mti_fpm_matches_reference():
    """MTI-Net Feature Propagation Module vs the reference (mti_net.py:56-100)
    with copied weights — incl. the consecutive-channel softmax grouping."""
    import importlib

    _install_mmcv_stub()  # mti_net -> padnet -> mmcv
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    rmti = importlib.import_module("models.mtl_methods.mti_net")
    from m3vit_tpu.models.mtl_methods import FPM

    tasks = ["semseg", "depth"]
    ptc = 32  # per-task channels (r=16 must divide ptc)
    torch.manual_seed(22)
    ref = rmti.FPM(tasks, ptc)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def conv(k):
        d = {"kernel": sd[k + ".weight"].transpose(2, 3, 1, 0)}
        if k + ".bias" in sd:
            d["bias"] = sd[k + ".bias"]
        return d

    def bn(k):
        return (
            {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]},
            {"mean": sd[k + ".running_mean"], "var": sd[k + ".running_var"]},
        )

    def basic(pre):
        p, s = {}, {}
        p["conv1"] = conv(pre + ".conv1")
        p["conv2"] = conv(pre + ".conv2")
        p["bn1"], s["bn1"] = bn(pre + ".bn1")
        p["bn2"], s["bn2"] = bn(pre + ".bn2")
        if pre + ".downsample.0.weight" in sd:
            p["ds_conv"] = conv(pre + ".downsample.0")
            p["ds_bn"], s["ds_bn"] = bn(pre + ".downsample.1")
        return p, s

    params, bstats = {}, {}
    params["nl1"], bstats["nl1"] = basic("non_linear.0")
    params["nl2"], bstats["nl2"] = basic("non_linear.1")
    params["nl_out"] = conv("non_linear.2")
    params["dim_red"], bstats["dim_red"] = basic("dimensionality_reduction")
    for t in tasks:
        params[f"se_{t}"] = {
            "fc1": {"kernel": sd[f"se.{t}.squeeze.0.weight"].T,
                    "bias": sd[f"se.{t}.squeeze.0.bias"]},
            "fc2": {"kernel": sd[f"se.{t}.squeeze.2.weight"].T,
                    "bias": sd[f"se.{t}.squeeze.2.bias"]},
        }

    rng = np.random.RandomState(35)
    feats = {
        f"features_{t}": rng.randn(2, ptc, 5, 5).astype(np.float32)
        for t in tasks
    }
    with torch.no_grad():
        ref_out = ref({k: torch.from_numpy(v) for k, v in feats.items()})
    out = FPM(tuple(tasks), ptc).apply(
        {"params": params, "batch_stats": bstats},
        {k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in feats.items()},
        train=False,
    )
    for t in tasks:
        np.testing.assert_allclose(
            np.asarray(out[t]).transpose(0, 3, 1, 2), ref_out[t].numpy(),
            atol=2e-5, err_msg=t,
        )


def test_tam_module_matches_reference():
    """TAM task-attention fusion vs the reference TamModule (models.py:11-135)
    with copied weights: gate block, weighted gated concat, encoder/decoder
    bottleneck (incl. ConvTranspose alignment), per-task heads."""
    import importlib

    _install_mmcv_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    rmod = importlib.import_module("models.models")
    from m3vit_tpu.models.tam import TamModule

    tasks = ["semseg", "depth", "sal"]
    ic = 8

    class _T:
        NUM_OUTPUT = {"semseg": 4, "depth": 1, "sal": 1}

    class _P(dict):
        TASKS = _T()

    torch.manual_seed(24)
    ref = rmod.TamModule(_P(), tasks, ic, norm_cfg=None)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def conv(k):
        d = {"kernel": sd[k + ".weight"].transpose(2, 3, 1, 0)}
        if k + ".bias" in sd:
            d["bias"] = sd[k + ".bias"]
        return d

    def convT(k):
        # torch ConvTranspose2d weight [Cin, Cout, kh, kw] -> flax
        # ConvTranspose kernel [kh, kw, Cin, Cout]... flax uses the
        # transposed-conv convention with flipped spatial taps
        w = sd[k + ".weight"]
        return {"kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
                "bias": sd[k + ".bias"]}

    def bn(k):
        return (
            {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]},
            {"mean": sd[k + ".running_mean"], "var": sd[k + ".running_var"]},
        )

    params, bstats = {}, {}
    for i in range(3):
        params[f"layers{i}_conv"] = conv(f"layers{i}.0")
        params[f"layers{i}_bn"], bstats[f"layers{i}_bn"] = bn(f"layers{i}.1")
    for i in range(2):
        params[f"encoder{i}_conv"] = conv(f"encoder{i}.0")
        params[f"encoder{i}_bn"], bstats[f"encoder{i}_bn"] = \
            bn(f"encoder{i}.1")
        params[f"decoder{i}_conv"] = convT(f"decoder{i}.0")
        params[f"decoder{i}_bn"], bstats[f"decoder{i}_bn"] = \
            bn(f"decoder{i}.1")
    for t in tasks:
        params[f"layers3_{t}_conv"] = conv(f"layers3.{t}.0")
        params[f"layers3_{t}_bn"], bstats[f"layers3_{t}_bn"] = \
            bn(f"layers3.{t}.1")
        params[f"layers4_{t}"] = conv(f"layers4.{t}.0")

    rng = np.random.RandomState(37)
    feats = {t: rng.randn(2, ic, 8, 8).astype(np.float32) for t in tasks}
    with torch.no_grad():
        ref_out = ref({t: torch.from_numpy(v) for t, v in feats.items()})

    ours = TamModule(tuple(tasks), ic, _T.NUM_OUTPUT, dtype=jnp.float32)
    out = ours.apply(
        {"params": params, "batch_stats": bstats},
        {t: jnp.asarray(v.transpose(0, 2, 3, 1)) for t, v in feats.items()},
        train=False,
    )
    for t in tasks:
        np.testing.assert_allclose(
            np.asarray(out[t]).transpose(0, 3, 1, 2), ref_out[t].numpy(),
            atol=5e-5, err_msg=t,
        )


# ---------------------------------------------------------------------------
# Training-trajectory parity: 20 REAL optimizer steps of the ACTUAL reference
# training stack (VisionTransformerMoE ckpt backbone + MultiTaskModel +
# MultiTaskLoss + cv_loss + SGD/poly, reference train/train_utils.py:346-527)
# vs our jitted train step from converted identical weights on identical
# batches.  This is the cross-framework evidence the forward-only tests above
# cannot give: noisy-gate gradients (noise off -> hard load path), BN
# batch-stat gradients, coupled-WD SGD momentum, per-epoch poly LR.
# ---------------------------------------------------------------------------


def _convert_pup_head_sd(sd, prefix):
    """Reference VisionTransformerUpHead state dict -> our flax params
    (production converter; promoted to torch_interop in round 4)."""
    from m3vit_tpu.utils.torch_interop import reference_pup_head_sd_to_params

    return reference_pup_head_sd_to_params(sd, prefix)


def _fabricated_trajectory_batches(n_steps, B, IMG, n_cls, seed=0):
    """Identical fabricated batches for both frameworks (torch NCHW layout)."""
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(n_steps):
        image = rng.randn(B, 3, IMG, IMG).astype(np.float32)
        semseg = rng.randint(0, n_cls, size=(B, 1, IMG, IMG)).astype(np.float32)
        semseg[rng.rand(B, 1, IMG, IMG) < 0.1] = 255.0
        normals = rng.randn(B, 3, IMG, IMG).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=1, keepdims=True) + 1e-12
        ignore = rng.rand(B, 1, IMG, IMG) < 0.1
        normals = np.where(ignore, 255.0, normals).astype(np.float32)
        batches.append({"image": image, "semseg": semseg, "normals": normals})
    return batches


def test_training_trajectory_matches_reference():
    """Per-step total/task losses and final params of 20 SGD steps must match
    the reference training stack to <=1e-3 relative (VERDICT round-1 item 2).

    Setup mirrors the flagship semantics at tiny scale: multi-gate MoE-ViT
    (dense even / MoE odd blocks), PUP heads, MultiTaskLoss weighted sum +
    0.01 * cv_loss, torch-coupled-WD SGD momentum 0.9 wd 1e-4, per-epoch poly
    LR over 4 epochs x 5 steps.  Gate noise off (vmoe_noisy_std=0 ->
    deterministic routing + hard load, reference
    ckpt/vision_transformer_moe.py:455-459); dropout/drop-path 0; capacity
    generous so the static dispatch never drops (ragged-parity).
    """
    import importlib

    from m3vit_tpu.losses.functions import loss_fn_for_task
    from m3vit_tpu.models.heads import VisionTransformerUpHead
    from m3vit_tpu.models.multitask import MultiTaskModel
    from m3vit_tpu.models.vit_moe import VisionTransformerMoE
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import TrainState
    from m3vit_tpu.train.step import make_train_step
    from m3vit_tpu.utils.torch_interop import merge_into

    vtm = _load_reference_backbone_module()
    _install_mmcv_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    vuh = importlib.import_module("models.heads.vit_up_head")
    ref_models = importlib.import_module("models.models")
    ref_schemes = importlib.import_module("losses.loss_schemes")
    ref_lossfn = importlib.import_module("losses.loss_functions")

    IMG, d, depth, heads, E, K = 64, 64, 2, 4, 8, 2
    TASKS = ["semseg", "normals"]
    N_CLS = {"semseg": 5, "normals": 3}
    WEIGHTS = {"semseg": 1.0, "normals": 10.0}
    T = len(TASKS)
    B, STEPS, EPOCHS, SPE = 2, 20, 4, 5
    # LR chosen so the 20-step trajectory moves visibly but divergence stays
    # below tolerance: the MoE training dynamics are chaotic (measured ~5x
    # growth per step of an ~1e-7 cross-framework f32 seed difference at
    # lr=0.05 — any two implementations differing in op order diverge like
    # this, including the reference against itself on different hardware),
    # and the growth rate scales with LR
    LR, MOM, WD, CVW = 0.003, 0.9, 1e-4, 0.01

    # ---- reference model -------------------------------------------------
    torch.manual_seed(11)
    ref_backbone = vtm.VisionTransformerMoE(
        model_name="tiny_traj", img_size=IMG, patch_size=16, embed_dim=d,
        depth=depth, num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
        drop_rate=0.0, moe_mlp_ratio=1, moe_experts=E, moe_top_k=K,
        world_size=1, moe_gate_type="noisy_vmoe", vmoe_noisy_std=0.0,
        random_init=True, use_checkpointing=True,
        multi_gate=True, gate_dim=d + T,
    )
    ref_decoders = torch.nn.ModuleDict({
        t: vuh.VisionTransformerUpHead(
            img_size=(IMG, IMG), patch_size=16, embed_dim=d, num_conv=4,
            num_upsampe_layer=4, p={}, in_channels=d, channels=256,
            num_classes=N_CLS[t],
        ) for t in TASKS
    })
    p_ref = {"multi_gate": True, "use_cv_loss": True, "use_checkpointing": True}
    ref_model = ref_models.MultiTaskModel(ref_backbone, ref_decoders, TASKS,
                                          p=p_ref)
    ref_model.train()
    # widen gate-logit margins: the default kaiming init leaves expert-prob
    # near-ties that flip the discrete top-k under ~1e-6 cross-framework f32
    # drift within a few SGD steps, making the comparison chaotic; scaling
    # w_gate separates the routing decision boundaries without changing any
    # semantics under test (both frameworks get the scaled weights)
    with torch.no_grad():
        for name, prm in ref_model.named_parameters():
            if name.endswith("w_gate"):
                prm.mul_(4.0)
    criterion = ref_schemes.MultiTaskLoss(
        TASKS,
        torch.nn.ModuleDict({
            "semseg": ref_lossfn.SoftMaxwithLoss(),
            "normals": ref_lossfn.NormalsLoss(normalize=True,
                                              size_average=True, norm=1),
        }),
        dict(WEIGHTS), multi_level=False, p={},
    )
    opt = torch.optim.SGD(ref_model.parameters(), lr=LR, momentum=MOM,
                          weight_decay=WD)

    # .copy(): .numpy() aliases the live torch parameter memory, and the
    # interleaved torch opt.step() below would mutate the converted weights
    # before the first jitted step materializes them
    sd = {k: v.detach().numpy().copy()
          for k, v in ref_model.state_dict().items()}

    # ---- our model from converted weights --------------------------------
    backbone = VisionTransformerMoE(
        img_size=(IMG, IMG), patch_size=16, embed_dim=d, depth=depth,
        num_heads=heads, mlp_ratio=4.0, qkv_bias=True, moe_mlp_ratio=1.0,
        moe_experts=E, moe_top_k=K, capacity_factor=8.0,
        eval_capacity_factor=8.0, dtype=jnp.float32, vmoe_noisy_std=0.0,
        multi_gate=True, num_tasks=T, use_checkpointing=True,
        use_pallas_ffn=False,
    )
    decoders = {
        t: VisionTransformerUpHead(
            img_size=(IMG, IMG), patch_size=16, embed_dim=d,
            num_classes=N_CLS[t], dtype=jnp.float32,
        ) for t in TASKS
    }
    model = MultiTaskModel(backbone=backbone, decoders=decoders, tasks=TASKS,
                           multi_gate=True)

    bb_params = _convert_backbone_sd(
        {k[len("backbone."):]: v for k, v in sd.items()
         if k.startswith("backbone.")}, depth, multi_gate_tasks=T)
    params = {"backbone": bb_params}
    bstats = {}
    for t in TASKS:
        hp, hb = _convert_pup_head_sd(sd, f"decoders.{t}.")
        params[f"decoders_{t}"] = hp
        bstats[f"decoders_{t}"] = hb

    batches = _fabricated_trajectory_batches(STEPS, B, IMG, N_CLS["semseg"])
    img0 = jnp.asarray(batches[0]["image"].transpose(0, 2, 3, 1))
    template = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        img0, train=True,
    )
    merged, missing = merge_into(template["params"], params)
    assert not missing, f"unconverted params: {missing}"

    p_opt = {"optimizer": "sgd",
             "optimizer_kwargs": {"lr": LR, "momentum": MOM,
                                  "weight_decay": WD},
             "scheduler": "poly", "epochs": EPOCHS}
    tx = build_optimizer(p_opt, steps_per_epoch=SPE)
    state = TrainState.create(
        apply_fn=model.apply, params=merged, tx=tx,
        batch_stats=merge_into(template["batch_stats"], bstats)[0],
    )
    loss_fns = {t: loss_fn_for_task(t, {}) for t in TASKS}
    step = make_train_step(model, TASKS, loss_fns, WEIGHTS, cv_weight=CVW,
                           donate=False)

    # ---- run both trajectories -------------------------------------------
    ref_hist, our_hist = [], []
    for i, b in enumerate(batches):
        epoch = i // SPE
        lr_e = LR * (1.0 - epoch / EPOCHS) ** 0.9
        for g in opt.param_groups:
            g["lr"] = lr_e

        images = torch.from_numpy(b["image"])
        targets = {"semseg": torch.from_numpy(b["semseg"]),
                   "normals": torch.from_numpy(b["normals"])}
        out, cv = ref_model(images)
        loss_dict = criterion(out, targets)
        total = loss_dict["total"] + CVW * cv
        opt.zero_grad(set_to_none=True)
        total.backward()
        opt.step()
        ref_hist.append({"total": float(total),
                         "semseg": float(loss_dict["semseg"]),
                         "normals": float(loss_dict["normals"]),
                         "cv": float(cv)})

        jb = {"image": jnp.asarray(b["image"].transpose(0, 2, 3, 1)),
              "semseg": jnp.asarray(b["semseg"].transpose(0, 2, 3, 1)),
              "normals": jnp.asarray(b["normals"].transpose(0, 2, 3, 1))}
        state, m = step(state, jb, jax.random.key(100 + i))
        our_hist.append({"total": float(m["loss_total_with_cv"]),
                         "semseg": float(m["loss_semseg"]),
                         "normals": float(m["loss_normals"]),
                         "cv": float(m["loss_cv"])})

    # cv_squared(load) is a function of INTEGER expert-load counts: a single
    # token whose top-2 gate probs sit within f32 drift of each other flips
    # an expert and jumps cv discontinuously by ~0.03-0.08 at E=8/68 slots
    # (observed: one flip at step 18, rel 7e-2, with every task loss still
    # within 1e-3).  The task losses and the weighted total (cv enters with
    # weight 0.01) are the parity-relevant trajectory; cv gets a looser
    # bound that still catches wrong load-estimator semantics (hard vs
    # smooth load differ by >50% here).
    TOL = {"total": 1e-3, "semseg": 1e-3, "normals": 1e-3, "cv": 1.5e-1}
    for i, (r, o) in enumerate(zip(ref_hist, our_hist)):
        for k in ("total", "semseg", "normals", "cv"):
            rel = abs(r[k] - o[k]) / max(abs(r[k]), 1e-6)
            assert rel <= TOL[k], (
                f"step {i} loss '{k}' diverged: ref={r[k]:.6f} "
                f"ours={o[k]:.6f} rel={rel:.2e}\nref={ref_hist}\nours={our_hist}"
            )

    # final trainable params must still agree
    sd_final = {k: v.detach().numpy()
                for k, v in ref_model.state_dict().items()}
    bb_final = _convert_backbone_sd(
        {k[len("backbone."):]: v for k, v in sd_final.items()
         if k.startswith("backbone.")}, depth, multi_gate_tasks=T)
    got = jax.tree.map(np.asarray, state.params["backbone"])
    want = jax.tree.map(np.asarray, bb_final)
    flat_g = {"/".join(map(str, k)): v
              for k, v in jax.tree_util.tree_flatten_with_path(got)[0]}
    flat_w = {"/".join(map(str, k)): v
              for k, v in jax.tree_util.tree_flatten_with_path(want)[0]}
    # atol: after 20 steps the chaotic amplification above leaves ~5e-4 max
    # drift on individual weights; a systematic optimizer bug (wrong LR
    # schedule, decoupled-instead-of-coupled WD, missing momentum) moves
    # params by >=1e-2 here and still fails this bound
    for k, w in flat_w.items():
        g = flat_g[k]
        np.testing.assert_allclose(
            g, w, atol=1e-3, rtol=2e-3,
            err_msg=f"final param mismatch at {k}")


def test_training_trajectory_taskcond_one_by_one_matches_reference():
    """Task-conditioned one-by-one training trajectory vs the reference.

    The OTHER headline routing mode: a single shared gate conditioned on a
    task one-hot through TaskRepresentMlp (reference
    ckpt/vision_transformer_moe.py:638-641,793-797), trained the way the
    reference trains it — per-task forward/backward with
    `model(images, single_task=t, task_id=i)` accumulating grads, ONE
    optimizer step per batch (train_utils.py:370-421 with --one_by_one /
    --task_one_hot).  Each task pass's loss = w_t * L_t + 0.01 * cv
    (cv from that pass).  20 steps, per-pass losses and final backbone
    params must match like the multi-gate trajectory test."""
    import importlib

    from m3vit_tpu.losses.functions import loss_fn_for_task
    from m3vit_tpu.models.heads import VisionTransformerUpHead
    from m3vit_tpu.models.multitask import TaskConditionedMultiTaskModel
    from m3vit_tpu.models.vit_moe import VisionTransformerMoE
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import TrainState
    from m3vit_tpu.train.step import make_one_by_one_train_step
    from m3vit_tpu.utils.torch_interop import merge_into

    vtm = _load_reference_backbone_module()
    _install_mmcv_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    vuh = importlib.import_module("models.heads.vit_up_head")
    ref_models = importlib.import_module("models.models")
    ref_schemes = importlib.import_module("losses.loss_schemes")
    ref_lossfn = importlib.import_module("losses.loss_functions")

    IMG, d, depth, heads, E, K, gtsd = 64, 64, 2, 4, 8, 2, 16
    TASKS = ["semseg", "normals"]
    N_CLS = {"semseg": 5, "normals": 3}
    WEIGHTS = {"semseg": 1.0, "normals": 10.0}
    T = len(TASKS)
    B, STEPS, EPOCHS, SPE = 2, 20, 4, 5
    # lower LR than the multi-gate trajectory test: the SHARED gate routes
    # both tasks' passes, so discrete top-k flips amplify cross-framework
    # f32 drift through twice as many conditioned passes per step (measured
    # rel 2e-3 at step 18 with lr=0.003; divergence growth scales with LR —
    # see the multi-gate test's calibration note)
    LR, MOM, WD, CVW = 0.002, 0.9, 1e-4, 0.01

    torch.manual_seed(21)
    ref_backbone = vtm.VisionTransformerMoE(
        model_name="tiny_tc_traj", img_size=IMG, patch_size=16, embed_dim=d,
        depth=depth, num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
        drop_rate=0.0, moe_mlp_ratio=1, moe_experts=E, moe_top_k=K,
        world_size=1, moe_gate_type="noisy_vmoe", vmoe_noisy_std=0.0,
        random_init=True, use_checkpointing=True,
        multi_gate=False, gate_dim=d + T, gate_task_specific_dim=gtsd,
    )
    ref_decoders = torch.nn.ModuleDict({
        t: vuh.VisionTransformerUpHead(
            img_size=(IMG, IMG), patch_size=16, embed_dim=d, num_conv=4,
            num_upsampe_layer=4, p={}, in_channels=d, channels=256,
            num_classes=N_CLS[t],
        ) for t in TASKS
    })
    p_ref = {"multi_gate": False, "use_cv_loss": True,
             "use_checkpointing": True}
    ref_model = ref_models.MultiTaskModel(ref_backbone, ref_decoders, TASKS,
                                          p=p_ref)
    ref_model.train()
    with torch.no_grad():  # widen routing margins (see multi-gate test)
        for name, prm in ref_model.named_parameters():
            if name.endswith("w_gate"):
                prm.mul_(4.0)
    criterion = ref_schemes.MultiTaskLoss(
        TASKS,
        torch.nn.ModuleDict({
            "semseg": ref_lossfn.SoftMaxwithLoss(),
            "normals": ref_lossfn.NormalsLoss(normalize=True,
                                              size_average=True, norm=1),
        }),
        dict(WEIGHTS), multi_level=False, p={},
    )
    opt = torch.optim.SGD(ref_model.parameters(), lr=LR, momentum=MOM,
                          weight_decay=WD)
    sd = {k: v.detach().numpy().copy()
          for k, v in ref_model.state_dict().items()}

    backbone = VisionTransformerMoE(
        img_size=(IMG, IMG), patch_size=16, embed_dim=d, depth=depth,
        num_heads=heads, mlp_ratio=4.0, qkv_bias=True, moe_mlp_ratio=1.0,
        moe_experts=E, moe_top_k=K, capacity_factor=8.0,
        eval_capacity_factor=8.0, dtype=jnp.float32, vmoe_noisy_std=0.0,
        multi_gate=False, num_tasks=T, gate_task_specific_dim=gtsd,
        use_checkpointing=True, use_pallas_ffn=False,
    )
    decoders = {
        t: VisionTransformerUpHead(
            img_size=(IMG, IMG), patch_size=16, embed_dim=d,
            num_classes=N_CLS[t], dtype=jnp.float32,
        ) for t in TASKS
    }
    model = TaskConditionedMultiTaskModel(backbone=backbone,
                                          decoders=decoders, tasks=TASKS)

    bb_params = _convert_backbone_sd(
        {k[len("backbone."):]: v for k, v in sd.items()
         if k.startswith("backbone.")}, depth, multi_gate_tasks=0)
    params = {"backbone": bb_params}
    bstats = {}
    for t in TASKS:
        hp, hb = _convert_pup_head_sd(sd, f"decoders.{t}.")
        params[f"decoders_{t}"] = hp
        bstats[f"decoders_{t}"] = hb

    batches = _fabricated_trajectory_batches(STEPS, B, IMG, N_CLS["semseg"],
                                             seed=3)
    img0 = jnp.asarray(batches[0]["image"].transpose(0, 2, 3, 1))
    template = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        img0, train=True,
    )
    merged, missing = merge_into(template["params"], params)
    assert not missing, f"unconverted params: {missing}"

    p_opt = {"optimizer": "sgd",
             "optimizer_kwargs": {"lr": LR, "momentum": MOM,
                                  "weight_decay": WD},
             "scheduler": "poly", "epochs": EPOCHS}
    tx = build_optimizer(p_opt, steps_per_epoch=SPE)
    state = TrainState.create(
        apply_fn=model.apply, params=merged, tx=tx,
        batch_stats=merge_into(template["batch_stats"], bstats)[0],
    )
    loss_fns = {t: loss_fn_for_task(t, {}) for t in TASKS}
    grad_fns, apply_fn = make_one_by_one_train_step(
        model, TASKS, loss_fns, WEIGHTS, cv_weight=CVW)

    ref_hist, our_hist = [], []
    for i, b in enumerate(batches):
        epoch = i // SPE
        lr_e = LR * (1.0 - epoch / EPOCHS) ** 0.9
        for g in opt.param_groups:
            g["lr"] = lr_e

        images = torch.from_numpy(b["image"])
        targets = {"semseg": torch.from_numpy(b["semseg"]),
                   "normals": torch.from_numpy(b["normals"])}
        opt.zero_grad(set_to_none=True)
        rstep = {}
        for tid, task in enumerate(TASKS):
            out_t = ref_model(images, single_task=task, task_id=tid)
            out, cv = out_t if isinstance(out_t, tuple) else (out_t, 0.0)
            loss_dict = criterion(out, targets, task)
            total = loss_dict["total"] + CVW * cv
            total.backward()
            rstep[task] = float(loss_dict[task])
            rstep[f"total_{task}"] = float(total)
        opt.step()
        ref_hist.append(rstep)

        jb = {"image": jnp.asarray(b["image"].transpose(0, 2, 3, 1)),
              "semseg": jnp.asarray(b["semseg"].transpose(0, 2, 3, 1)),
              "normals": jnp.asarray(b["normals"].transpose(0, 2, 3, 1))}
        grads_sum, merged_bs, ostep = None, dict(state.batch_stats), {}
        for task in TASKS:
            g, m, bs = grad_fns[task](state, jb, jax.random.key(200 + i))
            grads_sum = g if grads_sum is None else jax.tree.map(
                jnp.add, grads_sum, g)
            for k, v in (bs or {}).items():
                if k == f"decoders_{task}" or k not in merged_bs:
                    merged_bs[k] = v
            ostep[task] = float(m[f"loss_{task}"])
            ostep[f"total_{task}"] = float(m["loss_total"])
        state = apply_fn(state, grads_sum, merged_bs)
        our_hist.append(ostep)

    keys = [k for t in TASKS for k in (t, f"total_{t}")]
    for i, (r, o) in enumerate(zip(ref_hist, our_hist)):
        for k in keys:
            rel = abs(r[k] - o[k]) / max(abs(r[k]), 1e-6)
            assert rel <= 1e-3, (
                f"step {i} '{k}' diverged: ref={r[k]:.6f} ours={o[k]:.6f} "
                f"rel={rel:.2e}\nref={ref_hist}\nours={our_hist}")

    sd_final = {k: v.detach().numpy()
                for k, v in ref_model.state_dict().items()}
    bb_final = _convert_backbone_sd(
        {k[len("backbone."):]: v for k, v in sd_final.items()
         if k.startswith("backbone.")}, depth, multi_gate_tasks=0)
    got = jax.tree.map(np.asarray, state.params["backbone"])
    want = jax.tree.map(np.asarray, bb_final)
    flat_g = {"/".join(map(str, k)): v
              for k, v in jax.tree_util.tree_flatten_with_path(got)[0]}
    flat_w = {"/".join(map(str, k)): v
              for k, v in jax.tree_util.tree_flatten_with_path(want)[0]}
    for k, w in flat_w.items():
        np.testing.assert_allclose(
            flat_g[k], w, atol=1e-3, rtol=2e-3,
            err_msg=f"final param mismatch at {k}")
