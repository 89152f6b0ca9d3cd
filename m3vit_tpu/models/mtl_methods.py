"""Classic MTL baselines: cross-stitch, NDDR-CNN, MTAN, PAD-Net, MTI-Net.

Capability match for the reference's models/mtl_methods/*.py (flax, NHWC).
All models return (pred_dict, cv_loss=0, stats={}) for the uniform train-step
API; deep-supervision outputs use the reference's key conventions
('initial_<task>', 'deep_supervision'/'scale_<i>').
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3vit_tpu.models.heads import resize_bilinear
from m3vit_tpu.models.resnet import BasicBlock, Bottleneck, _bn, _conv

Dtype = Any


def _zero_cv():
    return jnp.asarray(0.0, jnp.float32)


class SEBlock(nn.Module):
    """Squeeze-and-excitation (reference models/layers.py:9-22)."""

    channels: int
    r: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(self.channels // self.r, dtype=self.dtype, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Dense(self.channels, dtype=self.dtype, name="fc2")(s)
        s = jax.nn.sigmoid(s)
        return x * s[:, None, None, :]


class SABlock(nn.Module):
    """Spatial attention block (reference models/layers.py:25-36)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        att = jax.nn.sigmoid(
            _conv(self.out_channels, 3, 1, 1, "attention", self.dtype)(x)
        )
        feat = _conv(self.out_channels, 3, 1, 1, "conv", self.dtype)(x)
        return feat * att


# ---------------------------------------------------------------------------
# Cross-stitch (reference mtl_methods/cross_stitch.py)
# ---------------------------------------------------------------------------
class CrossStitchUnit(nn.Module):
    tasks: Sequence[str]
    num_channels: int
    alpha: float = 0.9
    beta: float = 0.1

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = {}
        for ti in self.tasks:
            acc = None
            for tj in self.tasks:
                init_v = self.alpha if ti == tj else self.beta
                w = self.param(
                    f"stitch_{ti}_{tj}",
                    lambda k, s, v=init_v: jnp.full(s, v, jnp.float32),
                    (self.num_channels,),
                )
                term = feats[tj] * w[None, None, None, :]
                acc = term if acc is None else acc + term
            out[ti] = acc
        return out


class CrossStitchNetwork(nn.Module):
    """Per-task backbones stitched after every stage
    (reference cross_stitch.py:47-110)."""

    backbones: Dict[str, nn.Module]  # task -> ResNet
    heads: Dict[str, nn.Module]
    tasks: Sequence[str]
    channels: Sequence[int]  # per stage
    alpha: float = 0.9
    beta: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False, single_task=None):
        img_size = x.shape[1:3]
        feats = {t: self.backbones[t].forward_stem(x, train) for t in self.tasks}
        for stage in range(4):
            feats = {
                t: self.backbones[t].forward_stage(feats[t], stage, train)
                for t in self.tasks
            }
            feats = CrossStitchUnit(
                tuple(self.tasks), self.channels[stage], self.alpha, self.beta,
                name=f"stitch_stage{stage}",
            )(feats)
        out = {
            t: resize_bilinear(self.heads[t](feats[t], train=train), img_size)
            for t in self.tasks
        }
        return out, _zero_cv(), {}


# ---------------------------------------------------------------------------
# NDDR-CNN (reference mtl_methods/nddr_cnn.py)
# ---------------------------------------------------------------------------
class NDDRLayer(nn.Module):
    tasks: Sequence[str]
    channels: int
    alpha: float = 0.9
    beta: float = 0.1

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], train: bool = False):
        cat = jnp.concatenate([feats[t] for t in self.tasks], axis=-1)
        out = {}
        for i, task in enumerate(self.tasks):
            C, T = self.channels, len(self.tasks)

            def init_kernel(key, shape, dtype=jnp.float32, i=i):
                # [1, 1, C*T, C]: beta on every diagonal block, alpha on own
                w = jnp.tile(jnp.eye(C) * self.beta, (T, 1))
                w = w.at[i * C:(i + 1) * C].set(jnp.eye(C) * self.alpha)
                return w.reshape(shape).astype(dtype)

            h = nn.Conv(C, (1, 1), use_bias=False, kernel_init=init_kernel,
                        name=f"conv_{task}")(cat)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.95,
                             epsilon=1e-5, name=f"bn_{task}")(h)
            out[task] = jax.nn.relu(h)
        return out


class NDDRCNN(nn.Module):
    backbones: Dict[str, nn.Module]
    heads: Dict[str, nn.Module]
    tasks: Sequence[str]
    channels: Sequence[int]
    alpha: float = 0.9
    beta: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False, single_task=None):
        img_size = x.shape[1:3]
        feats = {t: self.backbones[t].forward_stem(x, train) for t in self.tasks}
        for stage in range(4):
            feats = {
                t: self.backbones[t].forward_stage(feats[t], stage, train)
                for t in self.tasks
            }
            feats = NDDRLayer(
                tuple(self.tasks), self.channels[stage], self.alpha, self.beta,
                name=f"nddr_stage{stage}",
            )(feats, train)
        out = {
            t: resize_bilinear(self.heads[t](feats[t], train=train), img_size)
            for t in self.tasks
        }
        return out, _zero_cv(), {}


# ---------------------------------------------------------------------------
# MTAN (reference mtl_methods/mtan.py)
# ---------------------------------------------------------------------------
class AttentionLayer(nn.Module):
    mid_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.mid_channels, (1, 1), name="conv1")(x)
        h = jax.nn.relu(_bn(train, "bn1")(h))
        h = nn.Conv(self.out_channels, (1, 1), name="conv2")(h)
        h = _bn(train, "bn2")(h)
        return jax.nn.sigmoid(h)


class RefinementBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Bottleneck(self.out_channels // 4, downsample=True,
                          name="bottleneck")(x, train)


class MTAN(nn.Module):
    """Task attention over a shared ResNet (reference mtan.py:43-148)."""

    backbone: nn.Module  # ResNet
    heads: Dict[str, nn.Module]
    tasks: Sequence[str]
    channels: Sequence[int]  # per stage
    downsample: Sequence[bool] = (True, True, True, False)

    @nn.compact
    def __call__(self, x, train: bool = False, single_task=None):
        img_size = x.shape[1:3]
        bb = self.backbone
        h = bb.forward_stem(x, train)

        u_b, u_t = [], []
        for s in range(4):
            b = bb.forward_stage(h, s, train, skip_last=True)
            t = bb.forward_stage_last_block(b, s, train)
            u_b.append(b)
            u_t.append(t)
            h = t

        ch = list(self.channels)
        a = None
        for s in range(4):
            att_in = (
                u_b[s] if s == 0
                else {task: jnp.concatenate([u_b[s], a[task]], -1)
                      for task in self.tasks}
            )
            new_a = {}
            for task in self.tasks:
                inp = att_in if s == 0 else att_in[task]
                mask = AttentionLayer(
                    ch[s] // 4, ch[s], name=f"attention_{s}_{task}"
                )(inp, train)
                new_a[task] = mask * u_t[s]
            if s < 3:
                # shared refinement block (one per stage, shared across tasks)
                refine = RefinementBlock(ch[s + 1], name=f"refine_{s}")
                refined = {}
                for task in self.tasks:
                    r = refine(new_a[task], train)
                    if self.downsample[s]:
                        r = nn.max_pool(r, (2, 2), strides=(2, 2))
                    refined[task] = r
                a = refined
            else:
                a = new_a

        out = {
            t: resize_bilinear(self.heads[t](a[t], train=train), img_size)
            for t in self.tasks
        }
        return out, _zero_cv(), {}


# ---------------------------------------------------------------------------
# PAD-Net (reference mtl_methods/padnet.py)
# ---------------------------------------------------------------------------
class InitialTaskPredictionModule(nn.Module):
    tasks: Sequence[str]
    num_outputs: Dict[str, int]
    intermediate_channels: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = {}
        for task in self.tasks:
            inp = x[task] if isinstance(x, dict) else x
            need_ds = inp.shape[-1] != self.intermediate_channels
            h = Bottleneck(self.intermediate_channels // 4, downsample=need_ds,
                           name=f"b1_{task}")(inp, train)
            h = Bottleneck(self.intermediate_channels // 4, downsample=False,
                           name=f"b2_{task}")(h, train)
            out[f"features_{task}"] = h
            out[task] = nn.Conv(self.num_outputs[task], (1, 1),
                                name=f"conv_out_{task}")(h)
        return out


class MultiTaskDistillationModule(nn.Module):
    tasks: Sequence[str]
    auxilary_tasks: Sequence[str]
    channels: int

    @nn.compact
    def __call__(self, x):
        out = {}
        for t in self.tasks:
            acc = x[f"features_{t}"]
            for a in self.auxilary_tasks:
                if a == t:
                    continue
                acc = acc + SABlock(self.channels, name=f"sa_{t}_{a}")(
                    x[f"features_{a}"]
                )
            out[t] = acc
        return out


class PADNet(nn.Module):
    backbone: nn.Module
    tasks: Sequence[str]
    auxilary_tasks: Sequence[str]
    num_outputs: Dict[str, int]

    @nn.compact
    def __call__(self, x, train: bool = False, single_task=None):
        img_size = x.shape[1:3]
        out = {}
        feats = self.backbone(x, train=train)
        if isinstance(feats, tuple):
            feats = feats[0]

        initial = InitialTaskPredictionModule(
            tuple(self.auxilary_tasks), self.num_outputs, name="initial"
        )(feats, train)
        for task in self.auxilary_tasks:
            out[f"initial_{task}"] = initial[task]

        distilled = MultiTaskDistillationModule(
            tuple(self.tasks), tuple(self.auxilary_tasks), 256,
            name="distillation",
        )(initial)

        for task in self.tasks:
            h = Bottleneck(64, name=f"head_b1_{task}")(distilled[task], train)
            h = Bottleneck(64, name=f"head_b2_{task}")(h, train)
            h = nn.Conv(self.num_outputs[task], (1, 1),
                        name=f"head_out_{task}")(h)
            out[task] = resize_bilinear(h, img_size)
        return out, _zero_cv(), {}


# ---------------------------------------------------------------------------
# MTI-Net (reference mtl_methods/mti_net.py)
# ---------------------------------------------------------------------------
class MTIInitialPrediction(nn.Module):
    tasks: Sequence[str]
    num_outputs: Dict[str, int]
    task_channels: int

    @nn.compact
    def __call__(self, feat_cur, feat_prev=None, train: bool = False):
        out = {}
        for t in self.tasks:
            if feat_prev is not None:
                prev = feat_prev[t]
                b, h, w, c = prev.shape
                prev = jax.image.resize(prev, (b, h * 2, w * 2, c), "bilinear")
                inp = jnp.concatenate([feat_cur, prev], axis=-1)
            else:
                inp = feat_cur
            need_ds = inp.shape[-1] != self.task_channels
            h_ = BasicBlock(self.task_channels, downsample=need_ds,
                            name=f"refine1_{t}")(inp, train)
            h_ = BasicBlock(self.task_channels, name=f"refine2_{t}")(h_, train)
            out[f"features_{t}"] = h_
            out[t] = nn.Conv(self.num_outputs[t], (1, 1),
                             name=f"decoder_{t}")(h_)
        return out


class FPM(nn.Module):
    """Feature propagation module (reference mti_net.py:56-100)."""

    tasks: Sequence[str]
    per_task_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        N = len(self.tasks)
        C = self.per_task_channels * N
        concat = jnp.concatenate(
            [x[f"features_{t}"] for t in self.tasks], axis=-1
        )
        h = BasicBlock(C // 4, downsample=True, name="nl1")(concat, train)
        h = BasicBlock(C // 4, name="nl2")(h, train)
        shared = nn.Conv(C, (1, 1), name="nl_out")(h)

        B, H, W, _ = concat.shape
        # the reference's view(B, C//N, N, H, W) + softmax(dim=2) normalizes
        # over groups of N CONSECUTIVE channels (mti_net.py:89-91) — match
        # that exact grouping, not a per-task-block one
        mask = jax.nn.softmax(
            shared.reshape(B, H, W, C // N, N), axis=4
        )
        mixed = (mask * concat.reshape(B, H, W, C // N, N)).reshape(B, H, W, C)
        mixed = BasicBlock(self.per_task_channels, downsample=True,
                           name="dim_red")(mixed, train)
        out = {}
        for t in self.tasks:
            out[t] = SEBlock(self.per_task_channels, name=f"se_{t}")(mixed) \
                + x[f"features_{t}"]
        return out


class MTINet(nn.Module):
    """MTI-Net on an HRNet backbone (reference mti_net.py:103-171)."""

    backbone: nn.Module  # returns 4 streams
    heads: Dict[str, nn.Module]
    tasks: Sequence[str]
    auxilary_tasks: Sequence[str]
    num_outputs: Dict[str, int]
    channels: Sequence[int] = (18, 36, 72, 144)

    @nn.compact
    def __call__(self, x, train: bool = False, single_task=None):
        img_size = x.shape[1:3]
        out: Dict = {}
        xs = self.backbone(x, train=train)
        ch = list(self.channels)
        aux = tuple(self.auxilary_tasks)

        x3 = MTIInitialPrediction(aux, self.num_outputs, ch[3],
                                  name="scale_3")(xs[3], None, train)
        f3 = FPM(aux, ch[3], name="fpm_3")(x3, train)
        x2 = MTIInitialPrediction(aux, self.num_outputs, ch[2],
                                  name="scale_2")(xs[2], f3, train)
        f2 = FPM(aux, ch[2], name="fpm_2")(x2, train)
        x1 = MTIInitialPrediction(aux, self.num_outputs, ch[1],
                                  name="scale_1")(xs[1], f2, train)
        f1 = FPM(aux, ch[1], name="fpm_1")(x1, train)
        x0 = MTIInitialPrediction(aux, self.num_outputs, ch[0],
                                  name="scale_0")(xs[0], f1, train)

        out["deep_supervision"] = {
            "scale_0": {k: v for k, v in x0.items() if "features" not in k},
            "scale_1": {k: v for k, v in x1.items() if "features" not in k},
            "scale_2": {k: v for k, v in x2.items() if "features" not in k},
            "scale_3": {k: v for k, v in x3.items() if "features" not in k},
        }

        d0 = MultiTaskDistillationModule(tuple(self.tasks), aux, ch[0],
                                         name="dist_0")(x0)
        d1 = MultiTaskDistillationModule(tuple(self.tasks), aux, ch[1],
                                         name="dist_1")(x1)
        d2 = MultiTaskDistillationModule(tuple(self.tasks), aux, ch[2],
                                         name="dist_2")(x2)
        d3 = MultiTaskDistillationModule(tuple(self.tasks), aux, ch[3],
                                         name="dist_3")(x3)

        for t in self.tasks:
            streams = [d0[t], d1[t], d2[t], d3[t]]
            out[t] = resize_bilinear(
                self.heads[t](streams, train=train), img_size
            )
        return out, _zero_cv(), {}


# ---------------------------------------------------------------------------
# PAP-Net (ViT features) — affinity diffusion (reference mtl_methods/papnet.py)
# ---------------------------------------------------------------------------
class AffinityDiffusionModule(nn.Module):
    """Task-affinity propagation: per-task pixel affinity matrices mixed by
    learned per-task alphas, iterated diffusion, residual beta-mix
    (reference papnet.py:81-148)."""

    tasks: Sequence[str]
    auxilary_tasks: Sequence[str]
    iterations: int = 6
    beta: float = 0.05

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        ref = feats[f"features_{self.auxilary_tasks[0]}"]
        B, H, W, C = ref.shape
        N = H * W

        # per-task affinity: softmax over rows of F F^T (flattened spatial)
        affin = {}
        for a in self.auxilary_tasks:
            f = feats[f"features_{a}"].reshape(B, N, C).astype(jnp.float32)
            affin[a] = jax.nn.softmax(
                jnp.einsum("bnc,bmc->bnm", f, f), axis=2
            )

        out = {}
        for task in self.tasks:
            alphas = []
            for t in self.auxilary_tasks:
                init = 1.0 if t == task else 0.0
                alphas.append(self.param(
                    f"alpha_{task}_{t}",
                    lambda k, s, v=init: jnp.full(s, v, jnp.float32), (1,),
                ))
            w = jax.nn.softmax(jnp.concatenate(alphas))
            agg = sum(w[i] * affin[t]
                      for i, t in enumerate(self.auxilary_tasks))
            f = feats[f"features_{task}"].reshape(B, N, C).astype(jnp.float32)
            y = f
            for _ in range(self.iterations):
                y = jnp.einsum("bnm,bmc->bnc", agg, y)
            mixed = (1 - self.beta) * f + self.beta * y
            out[f"aggregated_features_{task}"] = mixed.reshape(B, H, W, C)
        return out


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        x = _bn(train, "bn")(x)
        return jax.nn.relu(x) if self.relu else x


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")


def _tokens_to_2d(x, h, w):
    if x.ndim == 3:
        if x.shape[1] % 48 != 0:
            x = x[:, x.shape[1] - h * w:]
        b, hw, c = x.shape
        return x.reshape(b, h, w, c)
    return x


class PAPNetViT(nn.Module):
    """PAP-Net over ViT token features (reference PAPNet_vit, papnet.py:149-280).

    multi_level=True reproduces the papnet_new.py variant
    (reference mtl_methods/papnet_new.py:168-297): per-level 1x1-conv heads
    tap the refinement features AFTER each conv+BN and BEFORE its ReLU,
    emitting train-time ``level{1,2,3}_<task>`` deep-supervision outputs.
    papnet_new is dead code in the reference (never imported by
    common_config.py:555-556, and its level outputs feed no loss scheme);
    we reconstruct the evident intent: level predictions are resized to the
    input resolution (the reference's raw level maps would shape-mismatch
    every loss) and consumed by losses.schemes.multi_task_loss with the
    reference's weight/4 scaling (loss_schemes.py:32-35)."""

    backbone: nn.Module
    tasks: Sequence[str]
    auxilary_tasks: Sequence[str]
    num_outputs: Dict[str, int]
    embed_dim: int = 384
    img_size: Sequence[int] = (512, 512)
    patch_size: int = 16
    multi_level: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, single_task=None):
        img_size = x.shape[1:3]
        h = self.img_size[0] // self.patch_size
        w = self.img_size[1] // self.patch_size
        out: Dict = {}

        feats = self.backbone(x, train=train)
        if isinstance(feats, tuple):
            feats = feats[0]
        feats = nn.LayerNorm(epsilon=1e-6, name="norm")(
            _tokens_to_2d(feats.astype(jnp.float32), h, w)
        )

        upscale = {}
        for task in self.auxilary_tasks:
            f = _ConvBNRelu(self.embed_dim, name=f"layers0_{task}")(feats, train)
            upscale[task] = _up2(f)

        initial = InitialTaskPredictionModule(
            tuple(self.auxilary_tasks), self.num_outputs, name="initial"
        )(upscale, train)
        for task in self.auxilary_tasks:
            out[f"initial_{task}"] = initial[task]

        agg = AffinityDiffusionModule(
            tuple(self.tasks), tuple(self.auxilary_tasks),
            name="affinity_diffusion",
        )(initial)

        taps = self.multi_level and train

        def _level_tap(i, task, f):
            # papnet_new.py:281-297: 1x1 conv on the pre-ReLU conv+BN feature
            lvl = nn.Conv(self.num_outputs[task], (1, 1),
                          name=f"output_layers{i}_{task}")(f)
            out[f"level{i}_{task}"] = resize_bilinear(lvl, img_size)

        for task in self.tasks:
            f = agg[f"aggregated_features_{task}"]
            f = _ConvBNRelu(256, relu=False, name=f"layers1_{task}")(f, train)
            if taps:
                _level_tap(1, task, f)
            f = _up2(jax.nn.relu(f))
            f = _ConvBNRelu(256, relu=False, name=f"layers2_{task}")(f, train)
            if taps:
                _level_tap(2, task, f)
            f = _up2(jax.nn.relu(f))
            f = _ConvBNRelu(256, relu=False, name=f"layers3_{task}")(f, train)
            if taps:
                _level_tap(3, task, f)
            f = jax.nn.relu(f)
            f = nn.Conv(self.num_outputs[task], (1, 1),
                        name=f"layers4_{task}")(f)
            out[task] = resize_bilinear(_up2(f), img_size)
        return out, _zero_cv(), {}


# ---------------------------------------------------------------------------
# JTRL (reference mtl_methods/Jtrl.py:143-269)
# ---------------------------------------------------------------------------
class JTRL(nn.Module):
    """Joint task-recursive learning over ViT features: per-task conv/upsample
    towers from shared tokens, optional TAM fusion emitting tam_<task> keys."""

    backbone: nn.Module
    tasks: Sequence[str]
    auxilary_tasks: Sequence[str]
    num_outputs: Dict[str, int]
    embed_dim: int = 384
    img_size: Sequence[int] = (512, 512)
    patch_size: int = 16
    tam: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, single_task=None):
        img_size = x.shape[1:3]
        h = self.img_size[0] // self.patch_size
        w = self.img_size[1] // self.patch_size
        out: Dict = {}

        feats = self.backbone(x, train=train)
        if isinstance(feats, tuple):
            feats = feats[0]
        feats = nn.LayerNorm(epsilon=1e-6, name="norm")(
            _tokens_to_2d(feats.astype(jnp.float32), h, w)
        )

        deep = {}
        for task in self.auxilary_tasks:
            f = _up2(_ConvBNRelu(256, name=f"layers0_{task}")(feats, train))
            f = _up2(_ConvBNRelu(256, name=f"layers1_{task}")(f, train))
            f = _up2(_ConvBNRelu(256, name=f"layers2_{task}")(f, train))
            f = _ConvBNRelu(256, name=f"layers3_{task}")(f, train)
            if self.tam:
                deep[task] = f
            f = nn.Conv(self.num_outputs[task], (1, 1),
                        name=f"layers4_{task}")(f)
            out[task] = resize_bilinear(_up2(f), img_size)

        if self.tam and train:
            from m3vit_tpu.models.tam import TamModule

            tam_out = TamModule(
                tasks=tuple(self.tasks), input_channels=256,
                num_outputs=self.num_outputs, name="tam_model",
            )({t: deep[t] for t in self.tasks}, train=train)
            for task in self.tasks:
                out[f"tam_{task}"] = resize_bilinear(tam_out[task], img_size)
        return out, _zero_cv(), {}
