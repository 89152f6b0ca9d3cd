from m3vit_tpu.ops.expert_ffn import fused_expert_ffn, pallas_expert_ffn_available

__all__ = ["fused_expert_ffn", "pallas_expert_ffn_available"]
