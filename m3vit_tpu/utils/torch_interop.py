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


# ---------------------------------------------------------------------------
# Reference MoE checkpoint import: single files AND rank-sharded directories
# ---------------------------------------------------------------------------

# expert-parameter key markers (reference: utils/moe_utils.py:15)
EXPERT_KEYWORDS = ("mlp.experts.htoh4", "mlp.experts.h4toh")


def strip_checkpoint_prefixes(key: str) -> str:
    """Drop DDP/pretrain wrappers (reference: utils/moe_utils.py:18-23)."""
    if key.startswith("module."):
        key = key[len("module."):]
    if key.startswith("encoder."):
        key = key[len("encoder."):]
    return key


def _first_expert_dim0(sd: Dict[str, np.ndarray]) -> Optional[int]:
    for key, item in sd.items():
        if any(p in strip_checkpoint_prefixes(key) for p in EXPERT_KEYWORDS):
            return int(item.shape[0])
    return None


def load_reference_checkpoint(path: str, strip_prefixes: bool = True
                              ) -> Tuple[Dict, Dict[str, np.ndarray]]:
    """Load a reference checkpoint: a single ``.pth`` file OR a rank-sharded
    directory of ``{rank}.pth`` files.

    Directory format (reference: utils/moe_utils.py:164-178
    ``save_moe_model_to_dir``): rank 0 saves the full state dict; every other
    rank saves only its local slice of the expert tensors
    (``filter_state``).  Merging follows train_fastmoe.py:525-545: start from
    ``0.pth`` and ``torch.cat`` each higher rank's expert tensors on dim 0,
    in rank order, recovering the global ``[E_global, ...]`` expert banks.

    Returns ``(checkpoint, state_dict)`` where checkpoint is the raw
    unpickled dict (meta/args/epoch preserved, tensors untouched) and
    state_dict maps (optionally prefix-stripped) names to numpy arrays.
    """
    import os as _os

    import torch

    if not _os.path.isdir(path):
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt
        if isinstance(ckpt, dict):
            for key in ("model", "state_dict", "model_state"):
                if key in ckpt and isinstance(ckpt[key], dict):
                    sd = ckpt[key]
                    break
    else:
        ranks = sorted(
            (int(f[:-4]) for f in _os.listdir(path)
             if f.endswith(".pth") and f[:-4].isdigit())
        )
        if not ranks or ranks[0] != 0 or ranks != list(range(len(ranks))):
            raise FileNotFoundError(
                f"{path}: expected contiguous 0.pth..N.pth rank shards, "
                f"found ranks {ranks}"
            )
        ckpt = torch.load(_os.path.join(path, "0.pth"), map_location="cpu",
                          weights_only=False)
        sd = dict(ckpt["state_dict"])
        for r in ranks[1:]:
            shard = torch.load(_os.path.join(path, f"{r}.pth"),
                               map_location="cpu", weights_only=False)
            for key, item in shard["state_dict"].items():
                # shards hold expert tensors only; concat on the expert dim
                # (train_fastmoe.py:539-541)
                sd[key] = torch.cat([sd[key], item], dim=0)
        ckpt = dict(ckpt)
        ckpt["state_dict"] = sd
        # the per-rank files are marked 'local'; the merged result is global
        meta = dict(ckpt.get("meta") or {})
        meta["expert_format"] = "global"
        ckpt["meta"] = meta

    out = {}
    for k, v in sd.items():
        if strip_prefixes:
            k = strip_checkpoint_prefixes(k)
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return ckpt, out


def validate_reference_moe_checkpoint(
    checkpoint: Dict,
    state_dict: Dict[str, np.ndarray],
    num_global_experts: int,
    path: str = "<in-memory>",
) -> None:
    """Fail fast when a checkpoint holds rank-local experts only.

    Mirrors the reference's ``validate_single_file_moe_checkpoint_or_raise``
    (utils/moe_utils.py:34-106) for our always-global import view
    (``moe_experts`` is GLOBAL here; EP is a sharding, not a count):
    ``meta.expert_format == 'local'`` is always an error, ``'global'`` must
    match the expected expert count, and without meta the ckpt ``args``
    world-size heuristic + the expected-dim check apply.
    """
    dim0 = _first_expert_dim0(state_dict)
    if dim0 is None:
        return
    expected = int(num_global_experts)

    meta = checkpoint.get("meta", {}) if isinstance(checkpoint, dict) else {}
    fmt = meta.get("expert_format") if isinstance(meta, dict) else None
    if fmt == "global":
        if dim0 != expected:
            raise ValueError(
                "Checkpoint meta says global experts but tensor shape is "
                f"inconsistent. expected dim0={expected}, got {dim0}. "
                f"path={path}"
            )
        return
    if fmt == "local":
        raise ValueError(
            "Checkpoint meta indicates rank-local experts only. "
            f"path={path}\nLoad the full rank-shard DIRECTORY instead "
            "(load_reference_checkpoint merges it), or export a global "
            "checkpoint first."
        )

    args = checkpoint.get("args", {}) if isinstance(checkpoint, dict) else {}
    if isinstance(args, dict):
        ckpt_world = args.get("world_size")
        ckpt_global = args.get("moe_experts")
        if (ckpt_world is not None and ckpt_global is not None
                and int(ckpt_world) > 1
                and dim0 * int(ckpt_world) == int(ckpt_global)):
            raise ValueError(
                "Checkpoint appears to contain rank-local experts only "
                f"(expert_dim0={dim0}, ckpt_world_size={ckpt_world}, "
                f"ckpt_global_experts={ckpt_global}). path={path}\n"
                "Load the full rank-shard DIRECTORY instead."
            )
    if dim0 != expected:
        raise ValueError(
            "Cannot verify global expert format for MoE checkpoint. "
            f"expert_dim0={dim0}, expected_global={expected}, path={path}"
        )


def reference_backbone_sd_to_params(
    sd: Dict[str, np.ndarray],
    depth: Optional[int] = None,
    multi_gate_tasks: int = 0,
) -> Dict:
    """Reference ``VisionTransformerMoE`` state dict -> our flax param tree.

    Layout map (dense even blocks, MoE odd blocks — the reference's
    moe/ckpt/vision_transformer_moe.py:540-620 block alternation):
    torch Linear ``[out,in]`` -> flax kernel ``[in,out]``; Conv OIHW -> HWIO;
    LayerNorm weight/bias -> scale/bias; FMoELinear ``[E,out,in]`` ->
    ``[E,in,out]``; multi-gate ``mlp.gate.{t}.w_gate`` stacked on a leading
    task axis (our ``w_gate`` is ``[T,d_gate,E]``).
    """
    if depth is None:
        depth = 1 + max(
            int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
        )
    params: Dict = {
        "pos_embed": sd["pos_embed"],
        "cls_token": sd["cls_token"],
        "patch_embed": {"proj": {
            "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd["patch_embed.proj.bias"],
        }},
    }
    if "gate_task_represent.fc1.weight" in sd:
        params["gate_task_represent"] = {
            "fc1": {"kernel": sd["gate_task_represent.fc1.weight"].T,
                    "bias": sd["gate_task_represent.fc1.bias"]},
            "fc2": {"kernel": sd["gate_task_represent.fc2.weight"].T,
                    "bias": sd["gate_task_represent.fc2.bias"]},
            "norm": {"scale": sd["gate_task_represent.norm.weight"],
                     "bias": sd["gate_task_represent.norm.bias"]},
        }
    for i in range(depth):
        pre = f"blocks.{i}."
        blk: Dict = {
            "norm1": {"scale": sd[pre + "norm1.weight"],
                      "bias": sd[pre + "norm1.bias"]},
            "norm2": {"scale": sd[pre + "norm2.weight"],
                      "bias": sd[pre + "norm2.bias"]},
            "attn": {
                "qkv": {"kernel": sd[pre + "attn.qkv.weight"].T,
                        "bias": sd[pre + "attn.qkv.bias"]},
                "proj": {"kernel": sd[pre + "attn.proj.weight"].T,
                         "bias": sd[pre + "attn.proj.bias"]},
            },
        }
        if pre + "mlp.experts.htoh4.weight" in sd:  # MoE block
            if multi_gate_tasks > 0:
                w_gate = np.stack([
                    sd[pre + f"mlp.gate.{t}.w_gate"]
                    for t in range(multi_gate_tasks)
                ])
            else:
                w_gate = sd[pre + "mlp.gate.w_gate"][None]
            blk["mlp"] = {
                "w_gate": w_gate,
                "experts_w1":
                    sd[pre + "mlp.experts.htoh4.weight"].transpose(0, 2, 1),
                "experts_b1": sd[pre + "mlp.experts.htoh4.bias"],
                "experts_w2":
                    sd[pre + "mlp.experts.h4toh.weight"].transpose(0, 2, 1),
                "experts_b2": sd[pre + "mlp.experts.h4toh.bias"],
            }
            if pre + "mlp.gate.w_noise" in sd:  # noisy (non-vmoe) gate
                blk["mlp"]["w_noise"] = sd[pre + "mlp.gate.w_noise"][None]
            elif multi_gate_tasks > 0 and pre + "mlp.gate.0.w_noise" in sd:
                blk["mlp"]["w_noise"] = np.stack([
                    sd[pre + f"mlp.gate.{t}.w_noise"]
                    for t in range(multi_gate_tasks)
                ])
        else:
            blk["mlp"] = {
                "fc1": {"kernel": sd[pre + "mlp.fc1.weight"].T,
                        "bias": sd[pre + "mlp.fc1.bias"]},
                "fc2": {"kernel": sd[pre + "mlp.fc2.weight"].T,
                        "bias": sd[pre + "mlp.fc2.bias"]},
            }
        params[f"block_{i}"] = blk
    return params


def reference_pup_head_sd_to_params(
    sd: Dict[str, np.ndarray], prefix: str
) -> Tuple[Dict, Dict]:
    """Reference ``VisionTransformerUpHead`` state dict -> our flax
    (params, batch_stats) (reference: models/heads/vit_up_head.py)."""
    params: Dict = {"norm": {"scale": sd[prefix + "norm.weight"],
                             "bias": sd[prefix + "norm.bias"]}}
    bstats: Dict = {}
    for i in range(5):
        k = f"{prefix}conv_{i}.weight"
        if k not in sd:
            continue
        params[f"conv_{i}"] = {
            "kernel": sd[k].transpose(2, 3, 1, 0),
            "bias": sd[f"{prefix}conv_{i}.bias"],
        }
    for i in range(4):
        k = f"{prefix}syncbn_fc_{i}.weight"
        if k not in sd:
            continue
        params[f"syncbn_fc_{i}"] = {
            "scale": sd[k], "bias": sd[f"{prefix}syncbn_fc_{i}.bias"],
        }
        bstats[f"syncbn_fc_{i}"] = {
            "mean": sd[f"{prefix}syncbn_fc_{i}.running_mean"],
            "var": sd[f"{prefix}syncbn_fc_{i}.running_var"],
        }
    return params, bstats


def reference_mtl_sd_to_params(
    sd: Dict[str, np.ndarray],
    tasks,
    depth: Optional[int] = None,
    multi_gate_tasks: int = 0,
) -> Tuple[Dict, Dict]:
    """Full reference ``MultiTaskModel`` state dict (``backbone.* +
    decoders.{task}.*``, models/models.py) -> our (params, batch_stats)
    trees, ready for ``merge_into`` against a template."""
    bb = {k[len("backbone."):]: v for k, v in sd.items()
          if k.startswith("backbone.")}
    params: Dict = {
        "backbone": reference_backbone_sd_to_params(bb, depth,
                                                    multi_gate_tasks)
    }
    bstats: Dict = {}
    for t in tasks:
        hp, hb = reference_pup_head_sd_to_params(sd, f"decoders.{t}.")
        params[f"decoders_{t}"] = hp
        bstats[f"decoders_{t}"] = hb
    return params, bstats


def reference_token_sd_to_params(
    sd: Dict[str, np.ndarray],
    depth: Optional[int] = None,
    multi_gate_tasks: int = 0,
) -> Dict:
    """Reference ``TokenVisionTransformerMoE`` (the token persistent-sharing
    generation, models/moe/token/vision_transformer_moe.py) state dict ->
    our ``TokenVisionTransformerMoE`` param tree: per-block shareability
    heads (``share_pred.w_gate``), per-task gates, expert banks held
    directly on the block, and the shared dense FFN."""
    if depth is None:
        depth = 1 + max(
            int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
        )
    params: Dict = {
        "pos_embed": sd["pos_embed"],
        "cls_token": sd["cls_token"],
        "patch_embed": {"proj": {
            "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd["patch_embed.proj.bias"],
        }},
    }
    if "gate_task_represent.fc1.weight" in sd:
        params["gate_task_represent"] = {
            "fc1": {"kernel": sd["gate_task_represent.fc1.weight"].T,
                    "bias": sd["gate_task_represent.fc1.bias"]},
            "fc2": {"kernel": sd["gate_task_represent.fc2.weight"].T,
                    "bias": sd["gate_task_represent.fc2.bias"]},
            "norm": {"scale": sd["gate_task_represent.norm.weight"],
                     "bias": sd["gate_task_represent.norm.bias"]},
        }
    for i in range(depth):
        pre = f"blocks.{i}."
        blk: Dict = {
            "norm1": {"scale": sd[pre + "norm1.weight"],
                      "bias": sd[pre + "norm1.bias"]},
            "norm2": {"scale": sd[pre + "norm2.weight"],
                      "bias": sd[pre + "norm2.bias"]},
            "attn": {
                "qkv": {"kernel": sd[pre + "attn.qkv.weight"].T,
                        "bias": sd[pre + "attn.qkv.bias"]},
                "proj": {"kernel": sd[pre + "attn.proj.weight"].T,
                         "bias": sd[pre + "attn.proj.bias"]},
            },
        }
        if pre + "share_pred.w_gate" in sd:
            blk["share_pred"] = {"w_gate": sd[pre + "share_pred.w_gate"]}
        if pre + "mlp.experts.htoh4.weight" in sd:  # MoE block
            if multi_gate_tasks > 0:
                blk["w_gate"] = np.stack([
                    sd[pre + f"gate.{t}.w_gate"]
                    for t in range(multi_gate_tasks)
                ])
            else:
                blk["w_gate"] = sd[pre + "gate.w_gate"][None]
            blk["experts_w1"] = \
                sd[pre + "mlp.experts.htoh4.weight"].transpose(0, 2, 1)
            blk["experts_b1"] = sd[pre + "mlp.experts.htoh4.bias"]
            blk["experts_w2"] = \
                sd[pre + "mlp.experts.h4toh.weight"].transpose(0, 2, 1)
            blk["experts_b2"] = sd[pre + "mlp.experts.h4toh.bias"]
            if pre + "shared_ffn.fc1.weight" in sd:
                blk["shared_ffn_fc1"] = sd[pre + "shared_ffn.fc1.weight"].T
                blk["shared_ffn_b1"] = sd[pre + "shared_ffn.fc1.bias"]
                blk["shared_ffn_fc2"] = sd[pre + "shared_ffn.fc2.weight"].T
                blk["shared_ffn_b2"] = sd[pre + "shared_ffn.fc2.bias"]
        else:
            blk["mlp"] = {
                "fc1": {"kernel": sd[pre + "mlp.fc1.weight"].T,
                        "bias": sd[pre + "mlp.fc1.bias"]},
                "fc2": {"kernel": sd[pre + "mlp.fc2.weight"].T,
                        "bias": sd[pre + "mlp.fc2.bias"]},
            }
        params[f"block_{i}"] = blk
    return params


def params_to_reference_sd(
    params: Dict,
    batch_stats: Optional[Dict] = None,
    tasks=(),
    multi_gate_tasks: int = 0,
) -> Dict[str, np.ndarray]:
    """Inverse of ``reference_mtl_sd_to_params``: our flax (params,
    batch_stats) trees -> a reference-format ``MultiTaskModel`` state dict
    (``backbone.* + decoders.{task}.*``, torch layouts/names).

    Round-trips exactly with the forward converters (tested); lets our
    checkpoints be exported back into the reference's format and powers the
    fabricated-checkpoint smoke drill (scripts/fabricate_ref_ckpt.py)."""
    sd: Dict[str, np.ndarray] = {}

    def put(key, v):
        sd[key] = np.asarray(v)

    bb = params.get("backbone", params)
    put("backbone.pos_embed", bb["pos_embed"])
    put("backbone.cls_token", bb["cls_token"])
    put("backbone.patch_embed.proj.weight",
        np.asarray(bb["patch_embed"]["proj"]["kernel"]).transpose(3, 2, 0, 1))
    put("backbone.patch_embed.proj.bias", bb["patch_embed"]["proj"]["bias"])
    if "gate_task_represent" in bb:
        g = bb["gate_task_represent"]
        put("backbone.gate_task_represent.fc1.weight",
            np.asarray(g["fc1"]["kernel"]).T)
        put("backbone.gate_task_represent.fc1.bias", g["fc1"]["bias"])
        put("backbone.gate_task_represent.fc2.weight",
            np.asarray(g["fc2"]["kernel"]).T)
        put("backbone.gate_task_represent.fc2.bias", g["fc2"]["bias"])
        put("backbone.gate_task_represent.norm.weight", g["norm"]["scale"])
        put("backbone.gate_task_represent.norm.bias", g["norm"]["bias"])

    depth = 1 + max(
        (int(k.split("_")[1]) for k in bb if k.startswith("block_")),
        default=-1,
    )
    for i in range(depth):
        blk = bb[f"block_{i}"]
        pre = f"backbone.blocks.{i}."
        put(pre + "norm1.weight", blk["norm1"]["scale"])
        put(pre + "norm1.bias", blk["norm1"]["bias"])
        put(pre + "norm2.weight", blk["norm2"]["scale"])
        put(pre + "norm2.bias", blk["norm2"]["bias"])
        put(pre + "attn.qkv.weight", np.asarray(blk["attn"]["qkv"]["kernel"]).T)
        put(pre + "attn.qkv.bias", blk["attn"]["qkv"]["bias"])
        put(pre + "attn.proj.weight",
            np.asarray(blk["attn"]["proj"]["kernel"]).T)
        put(pre + "attn.proj.bias", blk["attn"]["proj"]["bias"])
        mlp = blk["mlp"]
        if "experts_w1" in mlp:  # MoE block
            w_gate = np.asarray(mlp["w_gate"])
            if multi_gate_tasks > 0:
                for t in range(multi_gate_tasks):
                    put(pre + f"mlp.gate.{t}.w_gate", w_gate[t])
            else:
                put(pre + "mlp.gate.w_gate", w_gate[0])
            if "w_noise" in mlp:
                w_noise = np.asarray(mlp["w_noise"])
                if multi_gate_tasks > 0:
                    for t in range(multi_gate_tasks):
                        put(pre + f"mlp.gate.{t}.w_noise", w_noise[t])
                else:
                    put(pre + "mlp.gate.w_noise", w_noise[0])
            put(pre + "mlp.experts.htoh4.weight",
                np.asarray(mlp["experts_w1"]).transpose(0, 2, 1))
            put(pre + "mlp.experts.htoh4.bias", mlp["experts_b1"])
            put(pre + "mlp.experts.h4toh.weight",
                np.asarray(mlp["experts_w2"]).transpose(0, 2, 1))
            put(pre + "mlp.experts.h4toh.bias", mlp["experts_b2"])
        else:
            put(pre + "mlp.fc1.weight", np.asarray(mlp["fc1"]["kernel"]).T)
            put(pre + "mlp.fc1.bias", mlp["fc1"]["bias"])
            put(pre + "mlp.fc2.weight", np.asarray(mlp["fc2"]["kernel"]).T)
            put(pre + "mlp.fc2.bias", mlp["fc2"]["bias"])

    for t in tasks:
        hp = params.get(f"decoders_{t}")
        if hp is None:
            continue
        pre = f"decoders.{t}."
        put(pre + "norm.weight", hp["norm"]["scale"])
        put(pre + "norm.bias", hp["norm"]["bias"])
        for i in range(5):
            if f"conv_{i}" not in hp:
                continue
            put(pre + f"conv_{i}.weight",
                np.asarray(hp[f"conv_{i}"]["kernel"]).transpose(3, 2, 0, 1))
            put(pre + f"conv_{i}.bias", hp[f"conv_{i}"]["bias"])
        hb = (batch_stats or {}).get(f"decoders_{t}", {})
        for i in range(4):
            if f"syncbn_fc_{i}" not in hp:
                continue
            put(pre + f"syncbn_fc_{i}.weight", hp[f"syncbn_fc_{i}"]["scale"])
            put(pre + f"syncbn_fc_{i}.bias", hp[f"syncbn_fc_{i}"]["bias"])
            bs = hb.get(f"syncbn_fc_{i}", {})
            put(pre + f"syncbn_fc_{i}.running_mean",
                bs.get("mean", np.zeros_like(hp[f"syncbn_fc_{i}"]["scale"])))
            put(pre + f"syncbn_fc_{i}.running_var",
                bs.get("var", np.ones_like(hp[f"syncbn_fc_{i}"]["scale"])))
    return sd


def save_reference_sharded_checkpoint(
    sd: Dict[str, np.ndarray],
    dirname: str,
    num_ranks: int,
    extra: Optional[Dict] = None,
) -> None:
    """Write a reference-format rank-sharded checkpoint DIRECTORY:
    ``0.pth`` holds the full state dict with rank-0's expert slices, ranks
    >0 hold their expert slices only (reference utils/moe_utils.py:128-178
    ``save_moe_model_to_dir``/``filter_state``/``read_specific_group_experts``
    semantics, without needing torch.distributed)."""
    import os as _os

    import torch

    _os.makedirs(dirname, exist_ok=True)
    expert_keys = [k for k in sd
                   if any(p in strip_checkpoint_prefixes(k)
                          for p in EXPERT_KEYWORDS)]
    e_global = int(sd[expert_keys[0]].shape[0]) if expert_keys else 0
    assert not expert_keys or e_global % num_ranks == 0, (
        f"{e_global} experts not divisible into {num_ranks} ranks"
    )
    e_local = e_global // num_ranks if expert_keys else 0
    for rank in range(num_ranks):
        lo, hi = rank * e_local, (rank + 1) * e_local
        if rank == 0:
            shard = {k: (v[lo:hi] if k in expert_keys else v)
                     for k, v in sd.items()}
        else:
            shard = {k: sd[k][lo:hi] for k in expert_keys}
        state = dict(extra or {})
        state["state_dict"] = {k: torch.as_tensor(np.ascontiguousarray(v))
                               for k, v in shard.items()}
        state.setdefault("meta", {})
        state["meta"] = dict(state["meta"], expert_format="local")
        torch.save(state, _os.path.join(dirname, f"{rank}.pth"))


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
