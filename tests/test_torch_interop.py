"""Torch-interop tests: weight conversion verified against a torch oracle ViT."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from m3vit_tpu.models.vit import VisionTransformer
from m3vit_tpu.models.vit_moe import VisionTransformerMoE
from m3vit_tpu.utils.torch_interop import (
    deit_to_backbone_params,
    interpolate_pos_embed,
    merge_into,
    upcycle_dense_mlp_to_experts,
)

D, HEADS, DEPTH, P, IMG = 32, 4, 2, 16, 64


class TorchBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(D, eps=1e-6)
        self.qkv = nn.Linear(D, D * 3, bias=True)
        self.proj = nn.Linear(D, D)
        self.norm2 = nn.LayerNorm(D, eps=1e-6)
        self.fc1 = nn.Linear(D, D * 4)
        self.fc2 = nn.Linear(D * 4, D)

    def forward(self, x):
        B, N, C = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, N, 3, HEADS, C // HEADS).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (C // HEADS) ** -0.5
        attn = attn.softmax(dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.proj(h)
        h = self.norm2(x)
        h = self.fc2(torch.nn.functional.gelu(self.fc1(h)))
        return x + h


class TorchViT(nn.Module):
    def __init__(self):
        super().__init__()
        n = (IMG // P) ** 2
        self.patch = nn.Conv2d(3, D, kernel_size=P, stride=P)
        self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, D) * 0.02)
        self.blocks = nn.ModuleList([TorchBlock() for _ in range(DEPTH)])

    def forward(self, x):
        B = x.shape[0]
        t = self.patch(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(B, -1, -1), t], dim=1)
        t = t + self.pos_embed
        for blk in self.blocks:
            t = blk(t)
        return t

    def reference_style_state_dict(self):
        sd = {}
        sd["cls_token"] = self.cls_token.detach()
        sd["pos_embed"] = self.pos_embed.detach()
        sd["patch_embed.proj.weight"] = self.patch.weight.detach()
        sd["patch_embed.proj.bias"] = self.patch.bias.detach()
        for i, blk in enumerate(self.blocks):
            pre = f"blocks.{i}."
            sd[pre + "norm1.weight"] = blk.norm1.weight.detach()
            sd[pre + "norm1.bias"] = blk.norm1.bias.detach()
            sd[pre + "norm2.weight"] = blk.norm2.weight.detach()
            sd[pre + "norm2.bias"] = blk.norm2.bias.detach()
            sd[pre + "attn.qkv.weight"] = blk.qkv.weight.detach()
            sd[pre + "attn.qkv.bias"] = blk.qkv.bias.detach()
            sd[pre + "attn.proj.weight"] = blk.proj.weight.detach()
            sd[pre + "attn.proj.bias"] = blk.proj.bias.detach()
            sd[pre + "mlp.fc1.weight"] = blk.fc1.weight.detach()
            sd[pre + "mlp.fc1.bias"] = blk.fc1.bias.detach()
            sd[pre + "mlp.fc2.weight"] = blk.fc2.weight.detach()
            sd[pre + "mlp.fc2.bias"] = blk.fc2.bias.detach()
        return {k: v.numpy() for k, v in sd.items()}


def test_dense_vit_matches_torch_oracle():
    torch.manual_seed(0)
    tmodel = TorchViT().eval()
    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        expected = tmodel(x).numpy()

    model = VisionTransformer(
        img_size=(IMG, IMG), patch_size=P, embed_dim=D, depth=DEPTH,
        num_heads=HEADS, qkv_bias=True, dtype=jnp.float32,
    )
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    template = model.init(jax.random.key(0), xj)["params"]
    loaded = deit_to_backbone_params(
        tmodel.reference_style_state_dict(), depth=DEPTH
    )
    params, missing = merge_into(template, loaded)
    assert missing == [], missing
    got = np.asarray(model.apply({"params": params}, xj))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_upcycle_replicate_mode():
    rng = np.random.RandomState(0)
    fc1_w = rng.randn(8, 4).astype(np.float32)  # [hidden, embed]
    fc1_b = rng.randn(8).astype(np.float32)
    fc2_w = rng.randn(4, 8).astype(np.float32)
    fc2_b = rng.randn(4).astype(np.float32)
    w1, b1, w2, b2 = upcycle_dense_mlp_to_experts(
        fc1_w, fc1_b, fc2_w, fc2_b, num_experts=6, expert_hidden=8
    )
    assert w1.shape == (6, 4, 8) and w2.shape == (6, 8, 4)
    np.testing.assert_array_equal(w1[3], fc1_w.T)
    np.testing.assert_array_equal(w2[5], fc2_w.T)


def test_upcycle_split_mode_partition():
    """Split mode: G=4 chunks; the group of G experts together reproduces the
    dense MLP output when summed (linear parts, no scaling)."""
    rng = np.random.RandomState(1)
    embed, hidden, G = 6, 16, 4
    fc1_w = rng.randn(hidden, embed).astype(np.float32)
    fc1_b = rng.randn(hidden).astype(np.float32)
    fc2_w = rng.randn(embed, hidden).astype(np.float32)
    fc2_b = rng.randn(embed).astype(np.float32)
    E = 8
    w1, b1, w2, b2 = upcycle_dense_mlp_to_experts(
        fc1_w, fc1_b, fc2_w, fc2_b, num_experts=E, expert_hidden=hidden // G
    )
    assert w1.shape == (E, embed, hidden // G)
    x = rng.randn(embed).astype(np.float32)
    # identity for the *linear* composition: sum_g W2_g @ W1_g == fc2 @ fc1
    dense = fc2_w @ (fc1_w @ x)
    split = sum((x @ w1[g]) @ w2[g] for g in range(G))
    np.testing.assert_allclose(split, dense, rtol=1e-4)
    # tiling: expert G+g == expert g
    np.testing.assert_array_equal(w1[0], w1[G])

    # scaling factor sqrt(E*G*G/K)
    w1s, _, _, _ = upcycle_dense_mlp_to_experts(
        fc1_w, fc1_b, fc2_w, fc2_b, num_experts=E,
        expert_hidden=hidden // G, top_k=2, use_weight_scaling=True,
    )
    scale = ((E // G) * G * G / 2.0) ** 0.5
    np.testing.assert_allclose(w1s[0], w1[0] * scale, rtol=1e-5)


def test_moe_backbone_accepts_upcycled_params():
    model = VisionTransformerMoE(
        img_size=(IMG, IMG), patch_size=P, embed_dim=D, depth=DEPTH,
        num_heads=HEADS, moe_mlp_ratio=1.0, moe_experts=8, moe_top_k=2,
        multi_gate=True, num_tasks=2, dtype=jnp.float32,
        capacity_factor=8.0, eval_capacity_factor=8.0,
        use_checkpointing=False,
    )
    x = jnp.ones((1, IMG, IMG, 3))
    template = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        x, task_id=jnp.asarray(0), train=False,
    )["params"]

    torch.manual_seed(2)
    tmodel = TorchViT()
    loaded = deit_to_backbone_params(
        tmodel.reference_style_state_dict(), depth=DEPTH,
        num_experts=8, expert_hidden=D, top_k=2,
    )
    params, missing = merge_into(template, loaded)
    # only the gates should be missing from the DeiT checkpoint
    assert all("w_gate" in m for m in missing), missing
    out, cv, _ = model.apply(
        {"params": params}, x, task_id=jnp.asarray(0), train=False
    )
    assert np.isfinite(np.asarray(out)).all()


def test_pos_embed_interp_shapes():
    pos = np.random.RandomState(0).randn(1, 1 + 14 * 14, 32).astype(np.float32)
    out = interpolate_pos_embed(pos, 1, (32, 32))
    assert out.shape == (1, 1 + 32 * 32, 32)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])


def test_pup_head_matches_torch_oracle():
    """PUP head forward parity: conv3x3+BN(eval)+relu+2x bilinear
    (align_corners=False) x4 + 1x1 conv, vs a torch oracle."""
    import torch.nn.functional as tF

    from m3vit_tpu.models.heads import VisionTransformerUpHead

    IMGH = 64
    torch.manual_seed(3)
    convs = [nn.Conv2d(D, 256, 3, padding=1), nn.Conv2d(256, 256, 3, padding=1),
             nn.Conv2d(256, 256, 3, padding=1), nn.Conv2d(256, 256, 3, padding=1)]
    conv4 = nn.Conv2d(256, 5, 1)
    norm = nn.LayerNorm(D, eps=1e-6)
    bns = [nn.BatchNorm2d(256).eval() for _ in range(4)]
    for bn in bns:  # non-trivial running stats
        bn.running_mean.normal_(0, 0.1)
        bn.running_var.uniform_(0.5, 1.5)

    toks = torch.randn(1, 17, D)

    with torch.no_grad():
        x = norm(toks[:, 1:])  # drop cls
        x = x.transpose(1, 2).reshape(1, D, 4, 4)
        x = convs[0](x); x = bns[0](x); x = tF.relu(x)
        x = tF.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        x = convs[1](x); x = bns[1](x); x = tF.relu(x)
        x = tF.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        x = convs[2](x); x = bns[2](x); x = tF.relu(x)
        x = tF.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        x = convs[3](x); x = bns[3](x); x = tF.relu(x)
        x = conv4(x)
        expected = tF.interpolate(x, scale_factor=2, mode="bilinear",
                                  align_corners=False).numpy()

    head = VisionTransformerUpHead(
        img_size=(IMGH, IMGH), patch_size=16, embed_dim=D, num_classes=5,
        dtype=jnp.float32,
    )
    variables = head.init(jax.random.key(0), jnp.asarray(toks.numpy()),
                          train=False)
    params = jax.tree.map(lambda x: x, variables["params"])
    bstats = dict(variables.get("batch_stats", {}))
    params["norm"] = {"scale": norm.weight.detach().numpy(),
                      "bias": norm.bias.detach().numpy()}
    for i, conv in enumerate(convs):
        params[f"conv_{i}"] = {
            "kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": conv.bias.detach().numpy(),
        }
    params["conv_4"] = {"kernel": conv4.weight.detach().numpy().transpose(2, 3, 1, 0),
                        "bias": conv4.bias.detach().numpy()}
    for i, bn in enumerate(bns):
        params[f"syncbn_fc_{i}"] = {"scale": bn.weight.detach().numpy(),
                                    "bias": bn.bias.detach().numpy()}
        bstats[f"syncbn_fc_{i}"] = {"mean": bn.running_mean.numpy(),
                                    "var": bn.running_var.numpy()}
    out = head.apply({"params": params, "batch_stats": bstats},
                     jnp.asarray(toks.numpy()), train=False)
    got = np.asarray(out).transpose(0, 3, 1, 2)  # NHWC -> NCHW
    np.testing.assert_allclose(got, expected, atol=2e-4)
