from m3vit_tpu.models.vit import VisionTransformer, Attention, PatchEmbed, MlpBlock
from m3vit_tpu.models.vit_moe import VisionTransformerMoE
from m3vit_tpu.models.heads import VisionTransformerUpHead
from m3vit_tpu.models.multitask import MultiTaskModel, SingleTaskModel
from m3vit_tpu.models.factory import build_model
from m3vit_tpu.models.token_moe import TokenMultiTaskModel, TokenVisionTransformerMoE
from m3vit_tpu.models.gate_vit import GateViT, MoEViTWithGate
from m3vit_tpu.models.tam import TamModule

__all__ = [
    "VisionTransformer",
    "VisionTransformerMoE",
    "VisionTransformerUpHead",
    "MultiTaskModel",
    "SingleTaskModel",
    "Attention",
    "PatchEmbed",
    "MlpBlock",
    "build_model",
    "TokenVisionTransformerMoE",
    "TokenMultiTaskModel",
    "GateViT",
    "MoEViTWithGate",
    "TamModule",
]
