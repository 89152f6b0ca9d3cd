"""Model composition: shared encoder + per-task decoders.

reference: models/models.py — SingleTaskModel (:137-148), MultiTaskModel
(:151-342).  The multi-gate path runs the backbone once per task with that
task's routers (:299-320); outputs are bilinearly resized to input size.

All model outputs are NHWC; every forward returns
(pred_dict, cv_loss, moe_stats) for a uniform train-step API.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3vit_tpu.models.heads import resize_bilinear


class SingleTaskModel(nn.Module):
    """Encoder + one decoder (reference models.py:137-148)."""

    backbone: nn.Module
    decoder: nn.Module
    task: str

    def __call__(self, x, train: bool = False):
        out_size = x.shape[1:3]
        feats = self.backbone(x, train=train)
        cv = jnp.asarray(0.0, jnp.float32)
        stats: Dict = {}
        if isinstance(feats, tuple):
            feats, cv, stats = feats
        out = resize_bilinear(self.decoder(feats, train=train), out_size)
        return {self.task: out}, cv, stats


class MultiTaskModel(nn.Module):
    """Shared encoder + task-specific decoders (reference models.py:151-342).

    multi_gate=True: one backbone pass per task with task_id routing.
    single_task: restrict forward to one task (sparse single-task inference /
    one-by-one training, reference train_utils.py:370-421).
    """

    backbone: nn.Module
    decoders: Dict[str, nn.Module]
    tasks: List[str]
    multi_gate: bool = False
    backbone_returns_tuple: bool = True
    # TAM task-attention fusion (reference models.py:165-213, 241-281)
    tam: bool = False
    tam_levels: Tuple[bool, bool, bool] = (True, True, True)
    num_outputs: Optional[Dict[str, int]] = None
    # fuse the per-task multi-gate backbone passes into ONE pass over a
    # task-major [T*B] stacked token batch (TPU-first: one XLA graph, the
    # patch embed runs once, per-task cv loss preserved via segmented
    # statistics).  Parameters are identical to the sequential form, so
    # checkpoints are interchangeable.
    stacked_tasks: bool = False
    # lax.scan the per-task multi-gate backbone passes (params broadcast,
    # task_id is the scanned input): the backbone's XLA program — and its
    # Pallas kernel instances — is emitted ONCE instead of T times.  Unlike
    # stacked_tasks only one task's activations are in flight at a time
    # (same working set as the sequential loop).  Parameters are identical
    # to the sequential form, so checkpoints are interchangeable.
    scan_tasks: bool = False
    # remat the scan_tasks body (scan-of-remat): without it lax.scan stacks
    # every per-task backbone residual as [T, ...] — at the flagship point
    # (B=8, 512², T=5, no block remat) those residuals exceed the 16 GB
    # chip and the step OOMs.  With it, only each task's block inputs are
    # saved and the backward replays the pass, so the working set matches
    # the sequential loop (one task in flight) at the cost of one extra
    # forward per task.  Numerics are exact either way.
    scan_tasks_remat: bool = True
    # run the task-independent prefix (patch embed + leading dense blocks —
    # multi-gate passes only diverge at the first per-task MoE gate) ONCE,
    # then loop the remaining blocks per task.  Exact numerics vs the
    # sequential loop (the backbone asserts the prefix is deterministic);
    # saves (T-1) redundant prefix fwd+bwd computations per step.
    shared_prefix: bool = False
    # rematerialize the decoder heads in the backward pass.  The PUP heads'
    # 512²x256ch conv activations dominate the train step's HBM footprint
    # (~14.7 GB at B=8 without remat on a 16 GB chip); trading their
    # recompute for memory unblocks larger batches and better XLA schedules.
    remat_heads: bool = False

    def _run_backbone(self, x, task_id: Optional[int], train: bool,
                      sem=None):
        tid = None if task_id is None else jnp.asarray(task_id, jnp.int32)
        if sem is not None:
            # sem-guided routing / regularizers (reference train_utils.py:424
            # passes targets['semseg'] during warmup epochs)
            ret = self.backbone(x, task_id=tid, train=train, sem=sem)
        else:
            ret = self.backbone(x, task_id=tid, train=train)
        if self.backbone_returns_tuple:
            return ret
        return ret, jnp.asarray(0.0, jnp.float32), {}

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        single_task: Optional[str] = None,
        sem: Optional[jnp.ndarray] = None,
    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, Dict]:
        out_size = x.shape[1:3]
        out: Dict[str, jnp.ndarray] = {}
        total_cv = jnp.asarray(0.0, jnp.float32)
        stats: Dict = {}

        if sum((self.stacked_tasks, self.scan_tasks, self.shared_prefix)) > 1:
            raise ValueError(
                "stacked_tasks / scan_tasks / shared_prefix are mutually "
                "exclusive multi-gate execution strategies; pick one")

        if single_task is not None:
            tid = self.tasks.index(single_task) if self.multi_gate else None
            feats, cv, stats = self._run_backbone(x, tid, train, sem)
            out[single_task] = resize_bilinear(
                self.decoders[single_task](feats, train=train), out_size
            )
            return out, cv, stats

        use_tam = self.tam and train
        deep: List[Dict[str, jnp.ndarray]] = [{}, {}, {}]

        def decode(task, feats):
            if self.remat_heads:
                ret = nn.remat(
                    lambda mdl, f, tr: mdl(f, train=tr),
                    static_argnums=(2,),
                )(self.decoders[task], feats, train)
            else:
                ret = self.decoders[task](feats, train=train)
            if use_tam and isinstance(ret, tuple):
                pred, f0, f1, f2 = ret
                deep[0][task], deep[1][task], deep[2][task] = f0, f1, f2
                return pred
            return ret

        if self.multi_gate and self.stacked_tasks:
            # one fused backbone pass over the task-major [T*B] stack
            T = len(self.tasks)
            tids = jnp.arange(T, dtype=jnp.int32)
            feats, total_cv, stats = self.backbone(
                x, task_id=tids, train=train, stacked_tasks=True, sem=sem
            )
            per_task = feats.reshape((T, x.shape[0]) + feats.shape[1:])
            for i, task in enumerate(self.tasks):
                out[task] = resize_bilinear(decode(task, per_task[i]),
                                            out_size)
        elif self.multi_gate and self.shared_prefix:
            # prefix (patch embed + leading dense blocks) once, rest per task
            T = len(self.tasks)
            tids = jnp.arange(T, dtype=jnp.int32)
            feats, total_cv, stats = self.backbone(
                x, task_id=tids, train=train, shared_prefix=True, sem=sem
            )
            per_task = feats.reshape((T, x.shape[0]) + feats.shape[1:])
            for i, task in enumerate(self.tasks):
                out[task] = resize_bilinear(decode(task, per_task[i]),
                                            out_size)
        elif self.multi_gate and self.scan_tasks:
            T = len(self.tasks)
            tids = jnp.arange(T, dtype=jnp.int32)

            def body(mdl, carry, tid):
                if sem is not None:
                    ret = mdl(x, task_id=tid, train=train, sem=sem)
                else:
                    ret = mdl(x, task_id=tid, train=train)
                return carry, ret

            if self.scan_tasks_remat:
                # prevent_cse is only needed for remat at jit top level;
                # inside scan it is safe off and compiles leaner
                body = nn.remat(body, prevent_cse=False)

            scan = nn.scan(
                body,
                variable_broadcast="params",
                # params rng broadcasts (one shared init); per-task noise
                # and dropout draws are split like the sequential loop's
                split_rngs={"params": False, "dropout": True,
                            "gate_noise": True},
                in_axes=0, out_axes=0,
            )
            _, (feats_all, cvs, st) = scan(self.backbone, 0, tids)
            total_cv = jnp.sum(cvs)
            stats = jax.tree.map(lambda a: a.sum(0), st)
            for i, task in enumerate(self.tasks):
                out[task] = resize_bilinear(decode(task, feats_all[i]),
                                            out_size)
        elif self.multi_gate:
            # one backbone pass per task, each with its own router set
            for i, task in enumerate(self.tasks):
                feats, cv, st = self._run_backbone(x, i, train, sem)
                total_cv = total_cv + cv
                stats = st if not stats else jax.tree.map(
                    lambda a, b: a + b, stats, st
                )
                out[task] = resize_bilinear(decode(task, feats), out_size)
        else:
            feats, total_cv, stats = self._run_backbone(x, None, train, sem)
            for task in self.tasks:
                out[task] = resize_bilinear(decode(task, feats), out_size)

        if use_tam:
            from m3vit_tpu.models.tam import TamModule

            for lvl in range(3):
                if not self.tam_levels[lvl] or not deep[lvl]:
                    continue
                tam_out = TamModule(
                    tasks=tuple(self.tasks), input_channels=256,
                    num_outputs=self.num_outputs, name=f"tam_model{lvl}",
                )(deep[lvl], train=train)
                for task in self.tasks:
                    out[f"tam_level{lvl}_{task}"] = resize_bilinear(
                        tam_out[task], out_size
                    )
        return out, total_cv, stats


class TaskConditionedMultiTaskModel(nn.Module):
    """Shared-gate task-conditioned mode: backbone runs once per task with a
    task one-hot feature concatenated to the gate input
    (reference models.py:215-287 with gate_task_specific_dim > 0)."""

    backbone: nn.Module
    decoders: Dict[str, nn.Module]
    tasks: List[str]
    # run the task-independent prefix once (see MultiTaskModel.shared_prefix);
    # the task-conditioned passes also diverge only at the first gate (the
    # task one-hot only enters through the gate input)
    shared_prefix: bool = False

    def __call__(self, x, train: bool = False, single_task: Optional[str] = None):
        out_size = x.shape[1:3]
        out: Dict[str, jnp.ndarray] = {}
        total_cv = jnp.asarray(0.0, jnp.float32)
        stats: Dict = {}
        if self.shared_prefix and single_task is None:
            T = len(self.tasks)
            tids = jnp.arange(T, dtype=jnp.int32)
            feats, total_cv, stats = self.backbone(
                x, task_id=tids, train=train, shared_prefix=True
            )
            per_task = feats.reshape((T, x.shape[0]) + feats.shape[1:])
            for i, task in enumerate(self.tasks):
                out[task] = resize_bilinear(
                    self.decoders[task](per_task[i], train=train), out_size
                )
            return out, total_cv, stats
        names = [single_task] if single_task is not None else self.tasks
        for task in names:
            tid = jnp.asarray(self.tasks.index(task), jnp.int32)
            feats, cv, st = self.backbone(x, task_id=tid, train=train)
            total_cv = total_cv + cv
            stats = st if not stats else jax.tree.map(lambda a, b: a + b, stats, st)
            out[task] = resize_bilinear(
                self.decoders[task](feats, train=train), out_size
            )
        return out, total_cv, stats
