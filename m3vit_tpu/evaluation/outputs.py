"""Per-task prediction post-processing (reference: utils/utils.py:60-79).

Operates on NHWC model outputs, returns numpy arrays in the same value
conventions as the reference (normals scaled to [0,255], argmax class maps,
255*sigmoid for edge/sal, raw depth).
"""

from __future__ import annotations

import numpy as np


def get_output_device(output, task: str):
    """jnp/on-device version of get_output for serving (serve.session):
    identical value conventions, compact wire dtypes — class maps and
    [0,255]-scaled tasks ship as uint8 (what the reference's PNG artifacts
    hold after cv2.imwrite's saturate-cast), depth as float32.  On hosts
    behind a slow device->host link this shrinks a semseg response from
    [B,H,W,21] f32 logits to [B,H,W] uint8 (~84x fewer bytes)."""
    import jax
    import jax.numpy as jnp

    out = output.astype(jnp.float32)  # [B, H, W, C]
    if task == "normals":
        norm = jnp.linalg.norm(out, ord=2, axis=3, keepdims=True)
        out = (out / jnp.maximum(norm, 1e-12) + 1.0) * 255.0 / 2.0
        return jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
    if task in ("semseg", "human_parts"):
        idx = jnp.argmax(out, axis=3)
        return idx.astype(jnp.uint8 if out.shape[3] <= 256 else jnp.int32)
    if task in ("edge", "sal"):
        v = 255.0 * jax.nn.sigmoid(out[..., 0])
        return jnp.clip(jnp.rint(v), 0, 255).astype(jnp.uint8)
    if task == "depth":
        return out[..., 0]
    raise ValueError(f"Select one of the valid tasks, got {task}")


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
