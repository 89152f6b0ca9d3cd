"""Per-task prediction post-processing (reference: utils/utils.py:60-79).

Operates on NHWC model outputs, returns numpy arrays in the same value
conventions as the reference (normals scaled to [0,255], argmax class maps,
255*sigmoid for edge/sal, raw depth).
"""

from __future__ import annotations

import numpy as np


def get_output(output: np.ndarray, task: str) -> np.ndarray:
    out = np.asarray(output, np.float32)  # [B, H, W, C]
    if task == "normals":
        norm = np.linalg.norm(out, ord=2, axis=3, keepdims=True)
        out = out / np.maximum(norm, 1e-12)
        return (out + 1.0) * 255.0 / 2.0
    if task in ("semseg", "human_parts"):
        return out.argmax(axis=3)
    if task in ("edge", "sal"):
        return np.squeeze(255.0 / (1.0 + np.exp(-out)), axis=3)
    if task == "depth":
        return np.squeeze(out, axis=3)
    raise ValueError(f"Select one of the valid tasks, got {task}")
