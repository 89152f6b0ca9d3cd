"""StableHLO model export for deployment (jax.export).

The reference ships checkpoints, not deployable artifacts — serving means
re-importing the training code (train_fastmoe.py:714-735).  Here the sparse
single-task forward (the reference's zero-overhead task-switch pathway,
README.md:8-20) exports to a self-contained StableHLO artifact that any
PJRT runtime can execute without the model code:

  exp = export_single_task(model, variables, task="semseg",
                           img_size=(512, 512))
  save_exported(exp, "semseg.jaxexp")
  ...
  fn = load_exported("semseg.jaxexp")      # callable, jit-compatible
  pred = fn(variables, images)             # or fn(images) if freeze=True

`freeze=True` bakes the weights into the artifact (classic saved-model
deployment: one file, no checkpoint at serve time).  `batch_size=None`
exports a symbolic batch dimension so one artifact serves every batch size
(XLA still compiles per concrete shape at call time — pair with
session.InferenceSession bucketing for static-shape serving).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _single_task_fn(model, task: str):
    def fn(variables, image):
        pred, _, _ = model.apply(variables, image, train=False,
                                 single_task=task)
        return pred[task]

    return fn


def export_single_task(
    model,
    variables,
    task: str,
    img_size: Tuple[int, int],
    *,
    batch_size: Optional[int] = 1,
    input_dtype=jnp.float32,
    freeze: bool = False,
    platforms: Optional[Tuple[str, ...]] = None,
) -> jax_export.Exported:
    """Export the sparse single-task forward as a StableHLO artifact.

    batch_size=None exports a symbolic leading dimension ("b").
    freeze=True closes over `variables` (weights become artifact
    constants); the exported callable then takes only `image`.
    platforms defaults to the current backend; pass e.g. ("tpu", "cpu")
    for a multi-platform artifact.
    """
    H, W = img_size
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        img_spec = jax.ShapeDtypeStruct((b, H, W, 3), input_dtype)
    else:
        img_spec = jax.ShapeDtypeStruct((batch_size, H, W, 3), input_dtype)

    fn = _single_task_fn(model, task)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)

    if freeze:
        frozen = lambda image: fn(variables, image)  # noqa: E731
        return jax_export.export(jax.jit(frozen), **kwargs)(img_spec)

    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        variables,
    )
    return jax_export.export(jax.jit(fn), **kwargs)(var_specs, img_spec)


def save_exported(exp: jax_export.Exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exp.serialize())


def load_exported(path: str):
    """Deserialize an artifact; returns a jit-compatible callable."""
    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    return exp.call


def main(argv=None):
    """CLI: config + checkpoint -> one StableHLO artifact per task.

    python -m m3vit_tpu.serve.export --config_env e.yml --config_exp x.yml
        --ckp <ckpt_dir> --tasks semseg --out_dir artifacts/ [--freeze]
        [--batch 1|sym]
    """
    import argparse
    import os

    from m3vit_tpu.config import create_config
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.models.factory import build_model
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import create_train_state
    from m3vit_tpu.utils.checkpoint import restore_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--config_env", required=True)
    ap.add_argument("--config_exp", required=True)
    ap.add_argument("--ckp", required=True, help="checkpoint directory")
    ap.add_argument("--tasks", nargs="+", default=None,
                    help="default: every task in the config")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--batch", default="1",
                    help="integer, or 'sym' for a symbolic batch dim")
    ap.add_argument("--freeze", action="store_true",
                    help="bake weights into the artifact")
    ap.add_argument("--int8_experts", action="store_true",
                    help="weight-only int8 quantization of the expert banks "
                         "(halves artifact/HBM expert bytes; "
                         "serve/quantize.py)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="force the jax backend (see cli.train --platform)")
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    p = create_config(args.config_env, args.config_exp, {})
    model = build_model(p, mesh=None, expert_axis=None)
    # restore into a structurally-matching state template (same optimizer
    # config as training, cf cli/train.py:406-415)
    tmpl_batch = synthetic_batch(jax.random.key(0), p["TASKS"], 1,
                                 tuple(p["test_scale"]))
    tx = build_optimizer(p, steps_per_epoch=1)
    state = create_train_state(model, jax.random.key(0), tmpl_batch, tx)
    restored, meta = restore_checkpoint(args.ckp, state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.ckp}")
    variables = {"params": restored.params}
    if restored.batch_stats:
        variables["batch_stats"] = restored.batch_stats
    print(f"restored epoch {meta.get('epoch')}")

    if args.int8_experts:
        from m3vit_tpu.serve.quantize import quantize_expert_tree

        variables["params"], err = quantize_expert_tree(
            variables["params"], with_error=True)
        p = dict(p) | {"expert_weights_int8": True}
        model = build_model(p, mesh=None, expert_axis=None)
        print(f"int8 experts: max relative dequant error {err:.4f}")

    tasks = args.tasks or list(p["TASK_NAMES"])
    bs = None if args.batch == "sym" else int(args.batch)
    os.makedirs(args.out_dir, exist_ok=True)
    for t in tasks:
        exp = export_single_task(
            model, variables, t, tuple(p["test_scale"]),
            batch_size=bs, freeze=args.freeze,
        )
        out = os.path.join(args.out_dir, f"{t}.jaxexp")
        save_exported(exp, out)
        print(f"exported {t} -> {out} "
              f"({os.path.getsize(out) / 1e6:.1f} MB, "
              f"platforms={exp.platforms})")


if __name__ == "__main__":
    main()
