"""Model factory: config dict -> flax model (the common_config.get_model
equivalent; reference: utils/common_config.py:124-567).

Reads the same YAML keys as the reference (backbone, backbone_kwargs, head,
head_kwargs, setup, multi_gate, ...) plus the reference's CLI-level MoE flags
surfaced as top-level config keys (moe_experts, moe_top_k, multi_gate,
vmoe_noisy_std, moe_gate_type, gate_task_specific_dim).

A crucial difference from the reference: `moe_experts` is the GLOBAL expert
count — expert parallelism is expressed by passing a mesh with an 'expert'
axis, never by dividing the expert count per process
(the reference mutates args.moe_experts //= world_size, common_config.py:179-185).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from m3vit_tpu.moe.dispatch import parse_capacity_factor
from m3vit_tpu.models.heads import VisionTransformerUpHead
from m3vit_tpu.models.multitask import (
    MultiTaskModel,
    SingleTaskModel,
    TaskConditionedMultiTaskModel,
)
from m3vit_tpu.models.vit import VisionTransformer
from m3vit_tpu.models.vit_moe import VisionTransformerMoE

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _dense_pallas_default(p) -> bool:
    """use_pallas_dense_ffn default: on where the kernel is compiled (TPU),
    off elsewhere (MlpBlock would fall back to slow interpreter mode on CPU).
    Measured +0.8 img/s/chip on the flagship train step (28.2 -> 29.0)."""
    v = p.get("use_pallas_dense_ffn")
    if v is not None:
        return bool(v)
    from m3vit_tpu.ops.expert_ffn import pallas_expert_ffn_available

    return pallas_expert_ffn_available()


def _img_size(kw) -> tuple:
    v = kw.get("img_size", (512, 512))
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def build_backbone(p, mesh=None, expert_axis: Optional[str] = "expert"):
    kw = dict(p.get("backbone_kwargs") or {})
    name = p["backbone"]
    dtype = _DTYPES[p.get("compute_dtype", "bfloat16")]
    common = dict(
        img_size=_img_size(kw),
        patch_size=int(kw.get("patch_size", 16)),
        embed_dim=int(kw.get("embed_dim", 384)),
        depth=int(kw.get("depth", 12)),
        num_heads=int(kw.get("num_heads", 6)),
        mlp_ratio=float(kw.get("mlp_ratio", 4.0)),
        qkv_bias=bool(kw.get("qkv_bias", True)),
        drop_rate=float(kw.get("drop_rate", 0.0)),
        attn_drop_rate=float(kw.get("attn_drop_rate", 0.0)),
        drop_path_rate=float(kw.get("drop_path_rate", 0.0)),
        distilled=bool(kw.get("distilled", False)),
        dtype=dtype,
        use_checkpointing=bool(p.get("use_checkpointing", False)),
    )

    if name == "VisionTransformer_moe":
        gate_dim = int(kw.get("gate_dim", -1))
        embed_dim = common["embed_dim"]
        num_tasks = int(
            p.get("moe_num_tasks", gate_dim - embed_dim if gate_dim > 0 else 0)
        )
        if num_tasks <= 0:
            num_tasks = len(p.get("TASK_NAMES", [])) or 1
        backbone = VisionTransformerMoE(
            moe_mlp_ratio=float(kw.get("moe_mlp_ratio", p.get("moe_mlp_ratio", -1))),
            moe_experts=int(p.get("moe_experts", kw.get("moe_experts", 16))),
            moe_top_k=int(p.get("moe_top_k", kw.get("moe_top_k", 4))),
            vmoe_noisy_std=float(p.get("vmoe_noisy_std", kw.get("vmoe_noisy_std", 1.0))),
            multi_gate=bool(p.get("multi_gate", False)),
            num_tasks=num_tasks,
            gate_task_specific_dim=int(p.get("gate_task_specific_dim", -1)),
            capacity_factor=parse_capacity_factor(p.get("moe_capacity_factor", 2.0)),
            eval_capacity_factor=parse_capacity_factor(
                p.get("moe_eval_capacity_factor", 4.0)),
            moe_gate_type=str(p.get("moe_gate_type", "noisy_vmoe")),
            use_pallas_ffn=bool(p.get("use_pallas_ffn", True)),
            use_pallas_dense_ffn=_dense_pallas_default(p),
            use_pallas_ln_mlp=bool(p.get("use_pallas_ln_mlp", False)),
            # pipelined EP exchange (moe/dispatch.py n_chunks); only
            # overlaps when the step is compiled with
            # xla_tpu_enable_async_all_to_all (cli/train.py --a2a_chunks)
            a2a_chunks=int(p.get("moe_a2a_chunks", 1)),
            expert_weights_int8=bool(p.get("expert_weights_int8", False)),
            scan_blocks=bool(p.get("scan_blocks", False)),
            # research knobs (reference train_fastmoe.py:107-155 CLI flags)
            expert_prune=bool(p.get("expert_prune", False)),
            prune_threshold=float(p.get("prune_threshold", 0.1)),
            regu_experts_fromtask=bool(p.get("regu_experts_fromtask", False)),
            num_experts_pertask=int(p.get("num_experts_pertask", -1)),
            sem_force=bool(p.get("sem_force", False)),
            regu_sem=bool(p.get("regu_sem", False)),
            regu_subimage=bool(p.get("regu_subimage", False)),
            gate_input_ahead=bool(p.get("gate_input_ahead", False)),
            mesh=mesh,
            expert_axis=expert_axis,
            **common,
        )
        return backbone, True
    if name in ("VisionTransformer", "VisionTransformer_dense"):
        return VisionTransformer(
            use_pallas_dense_ffn=_dense_pallas_default(p),
            use_pallas_ln_mlp=bool(p.get("use_pallas_ln_mlp", False)),
            mesh=mesh,
            **common,
        ), False

    # CNN backbones (the reference main.py path, common_config.py:124-170)
    dilated = bool(kw.get("dilated", False))
    if name == "resnet18":
        from m3vit_tpu.models.resnet import resnet18

        return resnet18(dilated=dilated, dtype=dtype), False
    if name == "resnet50":
        from m3vit_tpu.models.resnet import resnet50

        return resnet50(dilated=dilated, dtype=dtype), False
    if name == "hrnet_w18":
        from m3vit_tpu.models.hrnet import hrnet_w18

        return hrnet_w18(dtype=dtype), False
    if name in ("mobilenetv3", "mobilenetv3_large", "mobilenetv3_small"):
        from m3vit_tpu.models.mobilenetv3 import MobileNetV3

        variant = "small" if name.endswith("small") else "large"
        return MobileNetV3(variant=variant, dtype=dtype), False
    raise NotImplementedError(f"backbone {name}")


def build_head(p, task_name: str, num_output: int):
    name = p.get("head", "VisionTransformerUpHead")
    kw = dict(p.get("head_kwargs") or {})
    dtype = _DTYPES[p.get("compute_dtype", "bfloat16")]
    tam = bool((p.get("model_kwargs") or {}).get("tam", False))
    # the reference's token head (token/vit_up_head.py) is the same PUP head
    # minus TAM taps; 'deeplab' is its ASPP head (heads/aspp.py)
    if name in ("VisionTransformerUpHead", "TokenVisionTransformerUpHead"):
        return VisionTransformerUpHead(
            img_size=_img_size(kw),
            patch_size=int(kw.get("patch_size", 16)),
            embed_dim=int(kw.get("embed_dim", 384)),
            num_classes=num_output,
            num_conv=int(kw.get("num_conv", 4)),
            num_upsample_layer=int(kw.get("num_upsampe_layer", kw.get("num_upsample_layer", 4))),
            conv3x3_conv1x1=bool(kw.get("conv3x3_conv1x1", True)),
            return_tam_features=tam,
            dtype=dtype,
        )
    if name == "deeplab":
        from m3vit_tpu.models.cnn_heads import DeepLabHead

        return DeepLabHead(num_classes=num_output, dtype=dtype)
    if name == "hrnet":
        from m3vit_tpu.models.cnn_heads import HighResolutionHead

        return HighResolutionHead(num_classes=num_output, dtype=dtype)
    raise NotImplementedError(f"head {name}")


def _build_mtl_method(p, model_name: str, mesh=None):
    """MTL-method composition (reference common_config.py:497-567)."""
    tasks = [t.name for t in p["TASKS"]]
    aux = [t.name for t in p.get("AUXILARY_TASKS", p["TASKS"])]
    num_outputs = {t.name: t.num_output for t in p["ALL_TASKS"]}
    dtype = _DTYPES[p.get("compute_dtype", "bfloat16")]
    kw = dict(p.get("backbone_kwargs") or {})
    dilated = bool(kw.get("dilated", True))

    def resnet_bb():
        from m3vit_tpu.models.resnet import resnet18, resnet50

        name = p.get("backbone", "resnet18")
        return (resnet50 if "50" in str(name) else resnet18)(
            dilated=dilated, dtype=dtype
        )

    if model_name in ("cross_stitch", "nddr_cnn"):
        from m3vit_tpu.models.mtl_methods import CrossStitchNetwork, NDDRCNN

        bb = resnet_bb()
        channels = bb.stage_channels
        heads = {t: build_head(p, t, num_outputs[t]) for t in tasks}
        cls = CrossStitchNetwork if model_name == "cross_stitch" else NDDRCNN
        return cls(
            backbones={t: resnet_bb() for t in tasks}, heads=heads,
            tasks=tasks, channels=channels,
        )
    if model_name == "mtan":
        from m3vit_tpu.models.mtl_methods import MTAN

        bb = resnet_bb()
        ds = (True, False, False, False) if dilated else (True, True, True, False)
        return MTAN(
            backbone=bb,
            heads={t: build_head(p, t, num_outputs[t]) for t in tasks},
            tasks=tasks, channels=bb.stage_channels, downsample=ds,
        )
    if model_name == "padnet":
        from m3vit_tpu.models.mtl_methods import PADNet

        return PADNet(backbone=resnet_bb(), tasks=tasks, auxilary_tasks=aux,
                      num_outputs=num_outputs)
    if model_name == "mti_net":
        from m3vit_tpu.models.cnn_heads import HighResolutionHead
        from m3vit_tpu.models.hrnet import hrnet_w18
        from m3vit_tpu.models.mtl_methods import MTINet

        heads = {t: HighResolutionHead(num_classes=num_outputs[t], dtype=dtype)
                 for t in tasks}
        return MTINet(backbone=hrnet_w18(dtype=dtype), heads=heads,
                      tasks=tasks, auxilary_tasks=aux, num_outputs=num_outputs)
    if model_name in ("papnet_vit", "jtrl"):
        from m3vit_tpu.models.mtl_methods import JTRL, PAPNetViT

        backbone, _ = build_backbone(p, mesh, None)
        embed = int(kw.get("embed_dim", 384))
        img_size = _img_size(kw)
        patch = int(kw.get("patch_size", 16))
        if model_name == "papnet_vit":
            return PAPNetViT(backbone=backbone, tasks=tasks,
                             auxilary_tasks=aux, num_outputs=num_outputs,
                             embed_dim=embed, img_size=img_size,
                             patch_size=patch,
                             multi_level=bool(p.get("multi_level", False)))
        return JTRL(backbone=backbone, tasks=tasks, auxilary_tasks=aux,
                    num_outputs=num_outputs, embed_dim=embed,
                    img_size=img_size, patch_size=patch,
                    tam=bool((p.get("model_kwargs") or {}).get("tam", False)))
    raise NotImplementedError(f"model {model_name}")


def build_model(p, mesh=None, expert_axis: Optional[str] = "expert"):
    """Return the composed model for config p (reference get_model,
    common_config.py:468-567)."""
    model_name = p.get("model", "baseline")
    # reference spelling aliases (configs use 'pad_net', common_config.py:541)
    model_name = {"pad_net": "padnet"}.get(model_name, model_name)
    if model_name in ("cross_stitch", "nddr_cnn", "mtan", "padnet", "mti_net",
                      "papnet_vit", "jtrl"):
        return _build_mtl_method(p, model_name, mesh)
    if model_name == "mixture_baseline":
        from m3vit_tpu.models.mixture import (
            MixtureResNet,
            MultiTaskModelMixture,
            ShallowEmbedding,
        )

        dtype = _DTYPES[p.get("compute_dtype", "bfloat16")]
        tasks = [t.name for t in p["TASKS"]]
        input_dim = int(p.get("mixture_input_dim", 10))
        return MultiTaskModelMixture(
            backbone=MixtureResNet(tasks=tasks, input_dim=input_dim,
                                   dtype=dtype),
            prior=ShallowEmbedding(out_dim=input_dim, dtype=dtype),
            decoders={t.name: build_head(p, t.name, t.num_output)
                      for t in p["TASKS"]},
            tasks=tasks,
        )

    if p["backbone"] in ("TokenVisionTransformer_moe",
                         "Token_VisionTransformer_moe", "token_moe"):
        from m3vit_tpu.models.token_moe import (
            TokenMultiTaskModel,
            TokenVisionTransformerMoE,
        )

        kw = dict(p.get("backbone_kwargs") or {})
        dtype = _DTYPES[p.get("compute_dtype", "bfloat16")]
        tasks = [t.name for t in p["TASKS"]]
        backbone = TokenVisionTransformerMoE(
            img_size=_img_size(kw), patch_size=int(kw.get("patch_size", 16)),
            embed_dim=int(kw.get("embed_dim", 384)),
            depth=int(kw.get("depth", 12)),
            num_heads=int(kw.get("num_heads", 6)),
            mlp_ratio=float(kw.get("mlp_ratio", 4.0)),
            moe_mlp_ratio=float(kw.get("moe_mlp_ratio", 1.0)),
            moe_experts=int(p.get("moe_experts", 16)),
            moe_top_k=int(p.get("moe_top_k", 4)),
            multi_gate=bool(p.get("multi_gate", False)),
            num_tasks=len(tasks),
            gate_task_specific_dim=int(p.get("gate_task_specific_dim", 64)),
            share_gamma=float(p.get("share_gamma", 0.5)),
            bootstrap_share_gamma=float(p.get("bootstrap_share_gamma", 0.3)),
            bootstrap_first_moe=bool(p.get("bootstrap_first_moe", True)),
            share_reg_lambda=float(p.get("share_reg_lambda", 0.01)),
            capacity_factor=parse_capacity_factor(p.get("moe_capacity_factor", 2.0)),
            eval_capacity_factor=parse_capacity_factor(
                p.get("moe_eval_capacity_factor", 4.0)),
            use_pallas_ffn=bool(p.get("use_pallas_ffn", True)),
            use_pallas_dense_ffn=_dense_pallas_default(p),
            batched_dispatch=bool(p.get("batched_dispatch", False)),
            mesh=mesh, expert_axis=expert_axis, dtype=dtype,
            use_checkpointing=bool(p.get("use_checkpointing", False)),
        )
        decoders = {t.name: build_head(p, t.name, t.num_output)
                    for t in p["TASKS"]}
        return TokenMultiTaskModel(backbone=backbone, decoders=decoders,
                                   tasks=tasks)

    backbone, returns_tuple = build_backbone(p, mesh, expert_axis)
    tasks = [t.name for t in p["TASKS"]]
    decoders = {
        t.name: build_head(p, t.name, t.num_output) for t in p["TASKS"]
    }

    if p["setup"] == "single_task":
        task = tasks[0]
        if returns_tuple:
            return MultiTaskModel(
                backbone=backbone, decoders=decoders, tasks=tasks,
                multi_gate=bool(p.get("multi_gate", False)),
                backbone_returns_tuple=True,
            )
        return SingleTaskModel(
            backbone=backbone, decoder=decoders[task], task=task
        )

    assert p["setup"] == "multi_task"
    if int(p.get("gate_task_specific_dim", -1)) > 0 and not p.get("multi_gate"):
        return TaskConditionedMultiTaskModel(
            backbone=backbone, decoders=decoders, tasks=tasks,
            shared_prefix=bool(p.get("shared_prefix", False)),
        )
    mk = p.get("model_kwargs") or {}
    tam = bool(mk.get("tam", False))
    tam_levels = tuple(
        bool(mk.get(f"tam_level{i}", True)) for i in range(3)
    )
    return MultiTaskModel(
        backbone=backbone,
        decoders=decoders,
        tasks=tasks,
        multi_gate=bool(p.get("multi_gate", False)),
        backbone_returns_tuple=returns_tuple,
        tam=tam,
        tam_levels=tam_levels,
        num_outputs={t.name: t.num_output for t in p["TASKS"]},
        stacked_tasks=bool(p.get("stacked_tasks", False)),
        scan_tasks=bool(p.get("scan_tasks", False)),
        scan_tasks_remat=bool(p.get("scan_tasks_remat", True)),
        shared_prefix=bool(p.get("shared_prefix", False)),
        remat_heads=bool(p.get("remat_heads", False)),
    )
