from m3vit_tpu.evaluation.meters import (
    DepthMeter,
    EdgeMeter,
    HumanPartsMeter,
    NormalsMeter,
    PerformanceMeter,
    SaliencyMeter,
    SemsegMeter,
    calculate_multi_task_performance,
    single_task_reference_dict,
)
from m3vit_tpu.evaluation.outputs import get_output

__all__ = [
    "SemsegMeter",
    "HumanPartsMeter",
    "NormalsMeter",
    "DepthMeter",
    "SaliencyMeter",
    "EdgeMeter",
    "PerformanceMeter",
    "calculate_multi_task_performance",
    "single_task_reference_dict",
    "get_output",
]
