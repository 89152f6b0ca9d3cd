"""PyTorch checkpoint interop: DeiT/reference weights -> m3vit_tpu params.

Covers the reference's pretrained-start machinery in JAX terms:
  * load_pretrained pos-embed bilinear interpolation for larger inputs
    (reference: utils/helpers.py:329-464)
  * DeiT dense-MLP -> MoE expert upcycling, both modes
    (reference: utils/helpers.py:481-713):
      - moe_mlp_ratio=4: replicate fc1/fc2 into every expert
      - moe_mlp_ratio=1: split the dense MLP into G = dense_hidden /
        expert_hidden chunks as a template group, tile it across experts,
        optional sqrt(E_total*G^2/K) weight scaling
  * full name/layout mapping reference state_dict -> flax param pytree
    (torch Linear [out,in] -> flax kernel [in,out]; Conv OIHW -> HWIO;
    LayerNorm weight/bias -> scale/bias; FMoELinear [E,out,in] -> [E,in,out])

Everything here is host-side numpy; torch is only needed to unpickle .pth.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict):
        for key in ("model", "state_dict", "model_state"):
            if key in sd and isinstance(sd[key], dict):
                sd = sd[key]
                break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def interpolate_pos_embed(
    pos: np.ndarray, num_prefix: int, target_hw: Tuple[int, int]
) -> np.ndarray:
    """Bilinear (align_corners=False) pos-embed grid resize
    (reference: helpers.py:414-440)."""
    import jax
    import jax.numpy as jnp

    prefix = pos[:, :num_prefix]
    grid = pos[:, num_prefix:]
    n, hw, c = grid.shape
    h = w = int(round(hw**0.5))
    grid = grid.reshape(n, h, w, c)
    grid = np.asarray(
        jax.image.resize(
            jnp.asarray(grid), (n, target_hw[0], target_hw[1], c), "bilinear"
        )
    )
    grid = grid.reshape(n, target_hw[0] * target_hw[1], c)
    return np.concatenate([prefix, grid], axis=1)


def upcycle_dense_mlp_to_experts(
    fc1_w: np.ndarray,  # torch layout [hidden, embed]
    fc1_b: np.ndarray,  # [hidden]
    fc2_w: np.ndarray,  # [embed, hidden]
    fc2_b: np.ndarray,  # [embed]
    num_experts: int,
    expert_hidden: int,
    top_k: int = 4,
    use_weight_scaling: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """DeiT MLP -> expert bank, our layout (w1 [E,d,h], b1 [E,h], w2 [E,h,d],
    b2 [E,d]).  reference: helpers.py:481-713."""
    hidden = fc1_w.shape[0]
    E = num_experts
    if expert_hidden == hidden:
        # replicate mode (moe_mlp_ratio == mlp_ratio)
        w1 = np.repeat(fc1_w.T[None], E, 0)  # [E, embed, hidden]
        b1 = np.repeat(fc1_b[None], E, 0)
        w2 = np.repeat(fc2_w.T[None], E, 0)  # [E, hidden, embed]
        b2 = np.repeat(fc2_b[None], E, 0)
        return w1, b1, w2, b2

    # split mode
    assert hidden % expert_hidden == 0, (hidden, expert_hidden)
    G = hidden // expert_hidden
    assert E % G == 0, f"experts {E} must be divisible by granularity {G}"
    if use_weight_scaling:
        scale = ((E // G) * G * G / float(max(top_k, 1))) ** 0.5
    else:
        scale = 1.0
    fc1_w = fc1_w * scale
    fc2_w = fc2_w * scale
    fc1_b = fc1_b * scale

    # template group of G experts: chunk fc1 rows / fc2 columns
    t_w1 = np.stack(np.split(fc1_w, G, axis=0))  # [G, hidden/G, embed]
    t_b1 = np.stack(np.split(fc1_b, G, axis=0))  # [G, hidden/G]
    t_w2 = np.stack(np.split(fc2_w, G, axis=1))  # [G, embed, hidden/G]
    reps = E // G
    w1 = np.tile(t_w1, (reps, 1, 1)).transpose(0, 2, 1)  # [E, embed, hidden/G]
    b1 = np.tile(t_b1, (reps, 1))
    w2 = np.tile(t_w2, (reps, 1, 1)).transpose(0, 2, 1)  # [E, hidden/G, embed]
    b2 = np.repeat(fc2_b[None], E, 0)
    return w1, b1, w2, b2


def _linear(sd, key):
    return sd[key + ".weight"].T, sd[key + ".bias"]


def deit_to_backbone_params(
    sd: Dict[str, np.ndarray],
    *,
    depth: int,
    num_experts: Optional[int] = None,
    expert_hidden: Optional[int] = None,
    top_k: int = 4,
    use_weight_scaling: bool = False,
    target_grid: Optional[Tuple[int, int]] = None,
    num_prefix: int = 1,
    moe_every_odd: bool = True,
) -> Dict:
    """Map a DeiT-style torch state dict onto our VisionTransformer(MoE)
    param tree.  When num_experts is set, odd blocks become MoE blocks with
    upcycled experts; gates stay absent (keep random init via merge)."""
    params: Dict = {}

    pos = sd["pos_embed"]
    src_prefix = pos.shape[1] - int(round((pos.shape[1] - 1) ** 0.5)) ** 2
    if src_prefix not in (1, 2):
        src_prefix = 1
    if target_grid is not None:
        pos = interpolate_pos_embed(pos, src_prefix, target_grid)
    # align prefix token count
    if src_prefix != num_prefix:
        cls = pos[:, :1]
        grid = pos[:, src_prefix:]
        prefix = np.repeat(cls, num_prefix, axis=1)
        pos = np.concatenate([prefix, grid], axis=1)
    params["pos_embed"] = pos
    params["cls_token"] = sd["cls_token"]
    if num_prefix == 2 and "dist_token" in sd:
        params["dist_token"] = sd["dist_token"]

    pe_w = sd["patch_embed.proj.weight"]  # [C, 3, P, P] OIHW
    params["patch_embed"] = {
        "proj": {
            "kernel": pe_w.transpose(2, 3, 1, 0),  # HWIO
            "bias": sd["patch_embed.proj.bias"],
        }
    }

    for i in range(depth):
        pre = f"blocks.{i}."
        blk: Dict = {
            "norm1": {"scale": sd[pre + "norm1.weight"],
                      "bias": sd[pre + "norm1.bias"]},
            "norm2": {"scale": sd[pre + "norm2.weight"],
                      "bias": sd[pre + "norm2.bias"]},
            "attn": {},
        }
        qkv_k, qkv_b = _linear(sd, pre + "attn.qkv")
        proj_k, proj_b = _linear(sd, pre + "attn.proj")
        blk["attn"]["qkv"] = {"kernel": qkv_k, "bias": qkv_b}
        blk["attn"]["proj"] = {"kernel": proj_k, "bias": proj_b}

        is_moe = moe_every_odd and num_experts is not None and i % 2 == 1
        if is_moe:
            w1, b1, w2, b2 = upcycle_dense_mlp_to_experts(
                sd[pre + "mlp.fc1.weight"], sd[pre + "mlp.fc1.bias"],
                sd[pre + "mlp.fc2.weight"], sd[pre + "mlp.fc2.bias"],
                num_experts, expert_hidden, top_k, use_weight_scaling,
            )
            blk["mlp"] = {
                "experts_w1": w1, "experts_b1": b1,
                "experts_w2": w2, "experts_b2": b2,
            }
        else:
            fc1_k, fc1_b = _linear(sd, pre + "mlp.fc1")
            fc2_k, fc2_b = _linear(sd, pre + "mlp.fc2")
            blk["mlp"] = {
                "fc1": {"kernel": fc1_k, "bias": fc1_b},
                "fc2": {"kernel": fc2_k, "bias": fc2_b},
            }
        params[f"block_{i}"] = blk
    return params


def merge_into(template: Dict, loaded: Dict, path: str = "") -> Tuple[Dict, list]:
    """Recursively overlay `loaded` onto `template` (shape-checked); returns
    (merged, list of missing keys kept from template)."""
    import jax.numpy as jnp

    missing = []
    out = {}
    for k, tv in template.items():
        key = f"{path}/{k}" if path else str(k)
        if isinstance(tv, dict):
            lv = loaded.get(k, {}) if isinstance(loaded, dict) else {}
            sub, miss = merge_into(tv, lv, key)
            out[k] = sub
            missing += miss
        else:
            lv = loaded.get(k) if isinstance(loaded, dict) else None
            if lv is None:
                out[k] = tv
                missing.append(key)
            else:
                lv = np.asarray(lv)
                assert tuple(lv.shape) == tuple(tv.shape), (
                    f"{key}: loaded {lv.shape} != template {tv.shape}"
                )
                out[k] = jnp.asarray(lv, dtype=tv.dtype)
    return out, missing
