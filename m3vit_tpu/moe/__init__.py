from m3vit_tpu.moe.gating import (
    GateOutput,
    cv_squared,
    gates_to_load,
    noisy_vmoe_gate,
    prob_in_top_k,
)
from m3vit_tpu.moe.dispatch import moe_ffn, MoEFfnParams

__all__ = [
    "GateOutput",
    "cv_squared",
    "gates_to_load",
    "noisy_vmoe_gate",
    "prob_in_top_k",
    "moe_ffn",
    "MoEFfnParams",
]
