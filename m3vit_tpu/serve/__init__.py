"""Deployment / serving layer.

The reference has no serving story (inference is `--eval` inside the
trainer, train_fastmoe.py:714-735); its headline capability — sparse
single-task inference through one router pathway + one decoder
(reference README.md:8-20) — is what production deployment would serve.
This package makes that a first-class TPU artifact flow:

  export.py   — jax.export -> StableHLO artifacts (weight-carrying or
                weight-frozen), serialize/deserialize round-trip
  session.py  — AOT-compiled, static-shape bucketed InferenceSession
                (pad to the nearest batch bucket; one executable per
                (task, bucket), compiled once)
"""

from m3vit_tpu.serve.export import (
    export_single_task,
    load_exported,
    save_exported,
)
from m3vit_tpu.serve.session import InferenceSession

__all__ = [
    "export_single_task",
    "save_exported",
    "load_exported",
    "InferenceSession",
]
