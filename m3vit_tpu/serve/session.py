"""Static-shape bucketed inference sessions (AOT-compiled serving).

TPU/XLA compiles one program per shape; a production server must not
recompile per request size.  InferenceSession pads each request batch up
to the nearest configured bucket and runs an ahead-of-time compiled
executable for that (task, bucket) — the TPU-native replacement for the
reference's dynamic-batch torch eval loop (train_fastmoe.py:714-735).

    sess = InferenceSession(model, variables, tasks=["semseg"],
                            img_size=(512, 512), buckets=(1, 2, 4, 8))
    sess.warmup()                      # compile all buckets up front
    out = sess.predict(images, "semseg")   # any batch <= max bucket
"""

from __future__ import annotations

import bisect
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class InferenceSession:
    """Bucketed, AOT-compiled sparse single-task inference."""

    def __init__(
        self,
        model,
        variables,
        tasks: Sequence[str],
        img_size: Tuple[int, int],
        *,
        buckets: Sequence[int] = (1, 2, 4, 8),
        input_dtype=jnp.float32,
        donate_input: bool = False,
        raw_uint8_input: bool = False,
    ):
        self.model = model
        self.variables = variables
        self.tasks = list(tasks)
        self.img_size = tuple(img_size)
        self.buckets = sorted(set(int(b) for b in buckets))
        # raw_uint8_input: requests carry raw [0,255] uint8 pixels and the
        # executable performs /255 + ImageNet mean/std normalization ON
        # DEVICE (the client no longer pre-normalizes; the wire payload is
        # 4x smaller than f32).  Matches the training pipeline's Normalize
        # (data/transforms.py, reference custom_transforms.py:307-318).
        self.raw_uint8_input = raw_uint8_input
        self.input_dtype = jnp.uint8 if raw_uint8_input else input_dtype
        self._exec: Dict[Tuple[str, int], jax.stages.Compiled] = {}
        self._donate = donate_input

    # -- compilation ------------------------------------------------------

    def _fn(self, task: str, postprocess: bool):
        model = self.model
        raw = self.raw_uint8_input

        def fn(variables, image):
            if raw:
                from m3vit_tpu.data.transforms import (
                    IMAGENET_MEAN,
                    IMAGENET_STD,
                )

                image = (image.astype(jnp.float32) / 255.0
                         - jnp.asarray(IMAGENET_MEAN)) \
                    / jnp.asarray(IMAGENET_STD)
            pred, _, _ = model.apply(variables, image, train=False,
                                     single_task=task)
            if postprocess:
                from m3vit_tpu.evaluation.outputs import get_output_device

                return get_output_device(pred[task], task)
            return pred[task]

        return fn

    def _compile(self, task: str, bucket: int,
                 postprocess: bool = False) -> jax.stages.Compiled:
        key = (task, bucket, postprocess)
        if key not in self._exec:
            H, W = self.img_size
            spec = jax.ShapeDtypeStruct((bucket, H, W, 3), self.input_dtype)
            var_specs = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                               jnp.asarray(x).dtype),
                self.variables,
            )
            jitted = jax.jit(
                self._fn(task, postprocess),
                donate_argnums=(1,) if self._donate else (),
            )
            self._exec[key] = jitted.lower(var_specs, spec).compile()
        return self._exec[key]

    def warmup(self, tasks: Optional[Sequence[str]] = None,
               postprocess: bool = False) -> None:
        """Compile every (task, bucket) executable ahead of time."""
        for t in tasks if tasks is not None else self.tasks:
            for b in self.buckets:
                self._compile(t, b, postprocess)

    @property
    def compiled_keys(self):
        return sorted(self._exec.keys())

    # -- serving ----------------------------------------------------------

    def bucket_for(self, n: int) -> int:
        i = bisect.bisect_left(self.buckets, n)
        if i == len(self.buckets):
            raise ValueError(
                f"batch {n} exceeds the largest bucket {self.buckets[-1]}; "
                f"split the request or configure a larger bucket"
            )
        return self.buckets[i]

    def predict(self, images, task: str,
                postprocess: bool = False) -> np.ndarray:
        """Run `task` on [N, H, W, 3] images; N <= max bucket.

        Pads to the nearest bucket, runs the AOT executable, returns the
        first N rows as numpy.

        postprocess=True applies the task's `get_output` conversion
        (reference utils/utils.py:60-79) ON DEVICE — class-map argmax /
        [0,255] scaling — and ships the compact uint8/f32 result instead
        of raw logits (~84x fewer device->host bytes for semseg).

        Padding replicates the real images cyclically rather than using
        zeros: for MoE models the pad images join expert routing, and a
        bucket full of identical all-zero images would flood a few experts
        and could overflow their capacity (dropping REAL tokens).  Cyclic
        real padding routes like a legitimate full batch — the load the
        bucket was sized for.  For bit-stable MoE serving regardless of
        batch composition, export/serve with
        `moe_eval_capacity_factor: nodrop`.
        """
        if task not in self.tasks:
            raise ValueError(f"unknown task {task!r}; have {self.tasks}")
        images = jnp.asarray(images, self.input_dtype)
        n = images.shape[0]
        b = self.bucket_for(n)
        if b != n:
            reps = -(-b // n)  # ceil
            images = jnp.tile(images, (reps, 1, 1, 1))[:b]
        out = self._compile(task, b, postprocess)(self.variables, images)
        return np.asarray(out)[:n]
