from m3vit_tpu.losses.functions import (
    balanced_bce_loss,
    bce_loss,
    depth_l1_loss,
    normals_l1_loss,
    softmax_ce_loss,
    get_loss_fn,
)
from m3vit_tpu.losses.schemes import multi_task_loss, single_task_loss

__all__ = [
    "balanced_bce_loss",
    "bce_loss",
    "depth_l1_loss",
    "normals_l1_loss",
    "softmax_ce_loss",
    "get_loss_fn",
    "multi_task_loss",
    "single_task_loss",
]
