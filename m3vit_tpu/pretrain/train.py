"""ImageNet (or synthetic) MoE-ViT classification pretraining CLI.

The pretrain/train.py equivalent (reference: pretrain/train.py + engine/):
DeiT-style recipe — AdamW, cosine schedule with linear warmup, mixup/cutmix
with label smoothing, model EMA, cv-loss weighting (moe_cv_weight).  Emits
world-size-independent Orbax checkpoints directly loadable by the MTL
trainer (the reference needs export_to_mtl.py to merge rank shards first;
here the checkpoint is already global — see utils/checkpoint.py).

Example (synthetic smoke):
  python -m m3vit_tpu.pretrain.train --synthetic 4 --img_size 64 \
      --embed_dim 64 --depth 2 --num_heads 4 --moe_experts 8 --epochs 2
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from m3vit_tpu.models.cls import MoEViTForClassification
from m3vit_tpu.models.vit_moe import VisionTransformerMoE
from m3vit_tpu.pretrain.mixup import (
    mixup_cutmix,
    one_hot_smooth,
    soft_target_cross_entropy,
)
from m3vit_tpu.train.state import TrainState
from m3vit_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def parse_args(argv=None):
    ap = argparse.ArgumentParser("m3vit_tpu ImageNet pretraining")
    ap.add_argument("--data_dir", default=None, help="ImageFolder root")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--output_dir", default="/tmp/m3vit_pretrain")
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--num_classes", type=int, default=1000)
    ap.add_argument("--embed_dim", type=int, default=384)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--num_heads", type=int, default=6)
    ap.add_argument("--moe_experts", type=int, default=16)
    ap.add_argument("--moe_top_k", type=int, default=4)
    ap.add_argument("--moe_mlp_ratio", type=float, default=1.0)
    ap.add_argument("--moe_cv_weight", type=float, default=0.01)
    ap.add_argument("--dense", action="store_true",
                    help="dense DeiT baseline, no MoE (the reference's "
                         "pretrain/Dense_DeiT.py)")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--num_workers", type=int, default=8,
                    help="fork-pool loader workers (0 = in-process serial; "
                         "worker count never changes the data — per-sample "
                         "rng is derived from seed/epoch/index)")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--warmup_epochs", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--min_lr", type=float, default=1e-5,
                    help="cosine floor (reference --min-lr)")
    ap.add_argument("--opt", default="adamw",
                    help="adamw | sgd (reference --opt)")
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--clip_grad", type=float, default=None,
                    help="global-norm gradient clipping (reference "
                         "--clip-grad)")
    ap.add_argument("--weight_decay", type=float, default=0.05)
    ap.add_argument("--smoothing", type=float, default=0.1)
    ap.add_argument("--mixup", type=float, default=0.8)
    ap.add_argument("--cutmix", type=float, default=1.0)
    ap.add_argument("--ema_decay", type=float, default=0.99996)
    ap.add_argument("--drop_path", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--log_interval", type=int, default=50)
    # data parity knobs (reference pretrain/train.py:528-537 + samplers.py)
    ap.add_argument("--repeated_aug", dest="repeated_aug",
                    action="store_true", default=True,
                    help="DeiT repeated-augmentation sampling (reference "
                         "default True)")
    ap.add_argument("--no_repeated_aug", dest="repeated_aug",
                    action="store_false")
    ap.add_argument("--num_repeats", type=int, default=3)
    ap.add_argument("--val_dir", default=None,
                    help="eval ImageFolder; defaults to <data_dir>/val when "
                         "present (with train under <data_dir>/train), else "
                         "a deterministic per-class holdout of data_dir")
    ap.add_argument("--val_fraction", type=float, default=0.04,
                    help="holdout fraction when no val/ dir exists")
    ap.add_argument("--eval_interval", type=int, default=1,
                    help="epochs between val evals (raw + EMA weights)")
    return ap.parse_args(argv)


def synthetic_loader(args) -> Tuple[Iterator, int]:
    n = args.synthetic
    rng = np.random.RandomState(0)
    batches = [
        (
            rng.randn(args.batch_size, args.img_size, args.img_size, 3)
            .astype(np.float32),
            rng.randint(0, args.num_classes, args.batch_size),
        )
        for _ in range(n)
    ]

    def epochs(epoch):
        yield from batches

    return epochs, n


def imagefolder_loader(args):
    """Train + val loaders with the reference's split layout: data_dir/train +
    data_dir/val when present (reference imagenet.py:120-131), a flat folder
    with an explicit --val_dir, or a deterministic per-class holdout.
    Returns (train_epochs, steps_per_epoch, val_batches_fn)."""
    from m3vit_tpu.pretrain.data import (
        ImageFolder,
        iterate_epoch,
        iterate_eval,
        repeated_aug_order,
        split_train_val,
    )

    train_root = args.data_dir
    val_root = args.val_dir
    if val_root is None and os.path.isdir(os.path.join(args.data_dir, "val")) \
            and os.path.isdir(os.path.join(args.data_dir, "train")):
        train_root = os.path.join(args.data_dir, "train")
        val_root = os.path.join(args.data_dir, "val")

    ds = ImageFolder(train_root, args.img_size)
    train_subset = None
    val_batches = None
    if val_root is not None:
        val_ds = ImageFolder(val_root, args.img_size, train=False)
        val_batches = lambda: iterate_eval(val_ds, args.batch_size)  # noqa: E731
    elif args.val_fraction > 0:
        train_subset, val_idx = split_train_val(ds, args.val_fraction,
                                                args.seed)
        val_batches = lambda: iterate_eval(ds, args.batch_size, val_idx)  # noqa: E731

    n = len(train_subset) if train_subset is not None else len(ds)
    if args.repeated_aug:
        steps = len(repeated_aug_order(n, 0, args.num_repeats,
                                       args.seed)) // args.batch_size
    else:
        steps = n // args.batch_size

    def epochs(epoch):
        yield from iterate_epoch(
            ds, args.batch_size, epoch, args.seed,
            repeated_aug=args.repeated_aug, num_repeats=args.num_repeats,
            subset=train_subset, num_workers=args.num_workers,
        )

    return epochs, steps, val_batches


def build_model(args) -> MoEViTForClassification:
    if args.dense:
        from m3vit_tpu.models.vit import VisionTransformer

        class DenseEncoder(VisionTransformer):
            # classification wrapper expects (tokens, cv, stats)
            def __call__(self, x, task_id=None, train=False):
                toks = super().__call__(x, task_id=task_id, train=train)
                import jax.numpy as _jnp

                return toks, _jnp.asarray(0.0, _jnp.float32), {}

        encoder = DenseEncoder(
            img_size=(args.img_size, args.img_size), patch_size=16,
            embed_dim=args.embed_dim, depth=args.depth,
            num_heads=args.num_heads, drop_path_rate=args.drop_path,
            dtype=jnp.bfloat16, use_checkpointing=True,
        )
        return MoEViTForClassification(encoder=encoder,
                                       num_classes=args.num_classes)
    encoder = VisionTransformerMoE(
        img_size=(args.img_size, args.img_size),
        patch_size=16,
        embed_dim=args.embed_dim,
        depth=args.depth,
        num_heads=args.num_heads,
        drop_path_rate=args.drop_path,
        moe_mlp_ratio=args.moe_mlp_ratio,
        moe_experts=args.moe_experts,
        moe_top_k=args.moe_top_k,
        multi_gate=False,
        num_tasks=1,
        dtype=jnp.bfloat16,
        use_checkpointing=True,
    )
    return MoEViTForClassification(
        encoder=encoder, num_classes=args.num_classes
    )


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    if args.synthetic:
        loader, steps_per_epoch = synthetic_loader(args)
        val_batches = None
    else:
        loader, steps_per_epoch, val_batches = imagefolder_loader(args)

    model = build_model(args)
    warmup = args.warmup_epochs * steps_per_epoch
    total = max(args.epochs * steps_per_epoch, warmup + 1)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, total, end_value=args.min_lr
    )
    if args.opt == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(args.weight_decay),
            optax.sgd(schedule, momentum=args.momentum),
        )
    else:
        tx = optax.adamw(schedule, weight_decay=args.weight_decay)
    if args.clip_grad is not None:
        tx = optax.chain(optax.clip_by_global_norm(args.clip_grad), tx)

    sample_x = jnp.zeros((2, args.img_size, args.img_size, 3))
    variables = model.init(
        {"params": jax.random.key(args.seed),
         "gate_noise": jax.random.key(1)},
        sample_x, train=False,
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )
    ema_params = state.params
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"pretrain model: {n_params/1e6:.2f}M params, "
          f"{steps_per_epoch} steps/epoch")

    start_epoch = 0
    if args.resume:
        restored, meta = restore_checkpoint(
            os.path.join(args.output_dir, "checkpoint"), state
        )
        if restored is not None:
            state = restored
            start_epoch = int(meta.get("epoch", -1)) + 1
            print(f"resumed at epoch {start_epoch}")

    @jax.jit
    def train_step(state, ema_params, images, labels, rng):
        rng = jax.random.fold_in(rng, state.step)
        r_mix, r_gate, r_drop = jax.random.split(rng, 3)
        if args.mixup > 0 or args.cutmix > 0:
            images, targets = mixup_cutmix(
                r_mix, images, labels, args.num_classes,
                args.mixup, args.cutmix, args.smoothing,
            )
        else:
            targets = one_hot_smooth(labels, args.num_classes, args.smoothing)

        def loss_fn(params):
            logits, cv = model.apply(
                {"params": params}, images, train=True,
                rngs={"gate_noise": r_gate, "dropout": r_drop},
            )
            loss = soft_target_cross_entropy(logits, targets)
            return loss + args.moe_cv_weight * cv, (loss, cv)

        (total, (ce, cv)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        ema_params = jax.tree.map(
            lambda e, p: e * args.ema_decay + p * (1 - args.ema_decay),
            ema_params, state.params,
        )
        return state, ema_params, {"loss": ce, "cv": cv, "total": total}

    @jax.jit
    def eval_step(params, images, labels):
        logits, _ = model.apply({"params": params}, images, train=False)
        return (logits.argmax(-1) == labels).mean()

    rng = jax.random.key(args.seed + 1)
    best_ema = -1.0
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        for it, (images, labels) in enumerate(loader(epoch)):
            state, ema_params, m = train_step(
                state, ema_params, jnp.asarray(images), jnp.asarray(labels),
                rng,
            )
            if (it + 1) % args.log_interval == 0:
                print(f"[epoch {epoch} it {it+1}] loss={float(m['loss']):.4f} "
                      f"cv={float(m['cv']):.4f}")
        print(f"[epoch {epoch}] {time.time()-t0:.1f}s "
              f"loss={float(m['loss']):.4f}")
        save_checkpoint(os.path.join(args.output_dir, "checkpoint"), state,
                        epoch)
        # EMA weights saved alongside for the MTL export
        save_checkpoint(
            os.path.join(args.output_dir, "ema"),
            state.replace(params=ema_params), epoch,
        )
        # val eval on BOTH raw and EMA weights (the reference evaluates the
        # EMA model every epoch and tracks its best accuracy,
        # pretrain/train.py model_ema + engine/; DeiT recipe)
        if val_batches is not None and (epoch + 1) % args.eval_interval == 0:
            accs = {}
            for name, params in (("raw", state.params), ("ema", ema_params)):
                correct = seen = 0
                for images, labels in val_batches():
                    a = eval_step(params, jnp.asarray(images),
                                  jnp.asarray(labels))
                    correct += float(a) * len(labels)
                    seen += len(labels)
                accs[name] = correct / max(seen, 1)
            print(f"[epoch {epoch}] val acc raw={accs['raw']:.4f} "
                  f"ema={accs['ema']:.4f}")
            if accs["ema"] > best_ema:
                best_ema = accs["ema"]
                save_checkpoint(
                    os.path.join(args.output_dir, "best_ema"),
                    state.replace(params=ema_params), epoch,
                )
    return state


if __name__ == "__main__":
    main()
