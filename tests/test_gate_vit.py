"""Decoupled gate-ViT tests."""

import jax
import jax.numpy as jnp
import numpy as np

from m3vit_tpu.models.gate_vit import (
    GateViT,
    MoEViTWithGate,
    sincos_2d_pos_embed,
)
from m3vit_tpu.models.vit_moe import VisionTransformerMoE

IMG = 64


def test_sincos_pos_embed_properties():
    pos = sincos_2d_pos_embed(4, 4, 64)
    assert pos.shape == (1, 16, 64)
    # deterministic, bounded
    assert np.abs(pos).max() <= 1.0
    np.testing.assert_array_equal(pos, sincos_2d_pos_embed(4, 4, 64))


def test_gate_vit_tokens():
    gv = GateViT(img_size=(IMG, IMG), embed_dim=32, depth=1, num_heads=4)
    x = jnp.ones((2, IMG, IMG, 3))
    v = gv.init(jax.random.key(0), x)
    out = gv.apply(v, x)
    assert out.shape == (2, 17, 32)


def test_moe_with_decoupled_gate():
    backbone = VisionTransformerMoE(
        img_size=(IMG, IMG), patch_size=16, embed_dim=64, depth=2, num_heads=4,
        moe_mlp_ratio=1.0, moe_experts=8, moe_top_k=2, multi_gate=False,
        num_tasks=1, capacity_factor=8.0, dtype=jnp.float32,
        use_checkpointing=False,
    )
    gate_model = GateViT(img_size=(IMG, IMG), embed_dim=32, depth=1,
                         num_heads=4)
    model = MoEViTWithGate(backbone=backbone, gate_model=gate_model)
    x = jax.random.normal(jax.random.key(1), (1, IMG, IMG, 3))
    v = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        x, train=False,
    )
    toks, cv, _ = model.apply(v, x, train=False)
    assert toks.shape == (1, 17, 64)
    # gate weights sized by the gate model's dim (32), not the backbone's (64)
    w = v["params"]["backbone"]["block_1"]["mlp"]["w_gate"]
    assert w.shape == (1, 32, 8)
