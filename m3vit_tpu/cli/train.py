"""Multi-task (MoE-)ViT trainer CLI — the train_fastmoe.py / train_vit.py /
main.py equivalent (reference: train_fastmoe.py:76-761).

Differences from the reference launcher:
  * no torchrun/process groups: one process drives all local chips through a
    (data, expert) mesh; expert parallelism is a sharding, not a world size
  * checkpoints are world-size-independent Orbax directories
  * --synthetic trains on generated batches (smoke/perf runs without data)

Example:
  python -m m3vit_tpu.cli.train --config_exp configs/pascal/vit_moe_small.yml \
      --moe_experts 16 --moe_top_k 4 --multi_gate --use_cv_loss \
      --use_checkpointing --synthetic 8
"""

from __future__ import annotations

import argparse
import itertools
import os
import signal
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from m3vit_tpu.config import create_config
from m3vit_tpu.data.loader import (EpochLoader, device_put_batches,
                                    get_dataset, pad_batch)
from m3vit_tpu.data.synthetic import synthetic_batch
from m3vit_tpu.data.transforms import get_transformations
from m3vit_tpu.evaluation.orchestrate import evaluate_online, validate_results
from m3vit_tpu.losses.schemes import build_loss_fns
from m3vit_tpu.models.factory import build_model
from m3vit_tpu.moe.dispatch import parse_capacity_factor
from m3vit_tpu.parallel.mesh import batch_sharding, make_mesh, shard_train_state
from m3vit_tpu.train.optim import build_optimizer
from m3vit_tpu.train.state import create_train_state
from m3vit_tpu.train.step import make_eval_step, make_train_step
from m3vit_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from m3vit_tpu.utils.logging import MetricLogger, setup_stdout_tee


def parse_args(argv=None):
    ap = argparse.ArgumentParser("m3vit_tpu trainer")
    ap.add_argument("--config_env", default=None)
    ap.add_argument("--config_exp", "--config_path", dest="config_exp",
                    required=True)
    ap.add_argument("--run_name", default=None)
    ap.add_argument("--save_dir", default=None)
    # MoE flags (reference train_fastmoe.py:76-182)
    ap.add_argument("--moe_experts", type=int, default=None)
    ap.add_argument("--moe_top_k", type=int, default=None)
    ap.add_argument("--multi_gate", action="store_true", default=None)
    ap.add_argument("--stacked_tasks", action="store_true",
                    help="fuse the per-task multi-gate backbone passes into "
                         "one [T*B] pass (TPU-first; same params/metrics)")
    ap.add_argument("--scan_tasks", action="store_true",
                    help="lax.scan the per-task multi-gate backbone passes "
                         "(one compiled backbone program instead of T; same "
                         "params/metrics, sequential-loop working set)")
    ap.add_argument("--shared_prefix", action="store_true",
                    help="run the task-independent prefix (patch embed + "
                         "leading dense blocks) once per step instead of "
                         "once per task (multi-gate passes only diverge at "
                         "the first per-task MoE gate; exact numerics when "
                         "dropout is 0)")
    ap.add_argument("--no_scan_tasks_remat", action="store_true",
                    help="disable the scan-of-remat composition inside "
                         "--scan_tasks; without remat lax.scan stacks all "
                         "T tasks' residuals and OOMs at the flagship point "
                         "(only for small shapes / memory studies)")
    ap.add_argument("--remat_heads", action="store_true",
                    help="rematerialize decoder heads in backward (the PUP "
                         "heads dominate HBM; frees memory for larger B)")
    ap.add_argument("--moe_gate_type", "--moe_gate_arch",
                    dest="moe_gate_type", default=None,
                    help="'noisy_vmoe' (default) or 'noisy' (reference "
                         "--moe_gate_arch)")
    ap.add_argument("--moe_mlp_ratio", type=float, default=None)
    # research knobs (reference train_fastmoe.py:107-155)
    ap.add_argument("--expert_prune", action="store_true",
                    help="zero gate scores below prune_threshold")
    ap.add_argument("--regu_experts_fromtask", action="store_true",
                    help="restrict each task to a window of experts")
    ap.add_argument("--num_experts_pertask", type=int, default=None)
    ap.add_argument("--regu_sem", action="store_true",
                    help="semantic prior head on gate logits (warmup epochs)")
    ap.add_argument("--sem_force", action="store_true",
                    help="force routing by semantic class groups (warmup)")
    ap.add_argument("--regu_subimage", action="store_true",
                    help="subimage routing-consistency KL (warmup epochs)")
    ap.add_argument("--semregu_loss_weight", type=float, default=0.01)
    ap.add_argument("--subimageregu_weight", type=float, default=0.01)
    ap.add_argument("--gate_input_ahead", action="store_true",
                    help="gate input = block input tokens (reference "
                         "origin/vision_transformer_moe.py:276)")
    ap.add_argument("--warmup_epochs", type=int, default=5,
                    help="epochs during which sem-guided knobs are active "
                         "(reference train_utils.py:424)")
    ap.add_argument("--one_by_one", action="store_true",
                    help="per-task forward/backward with gradient "
                         "accumulation, one optimizer step per batch "
                         "(reference train_utils.py:370-421); identical "
                         "gradients to the joint loop, ~1/T peak memory")
    ap.add_argument("--task_one_hot", action="store_true",
                    help="task-conditioned MoE (reference --task_one_hot; "
                         "requires gate_task_specific_dim > 0 and implies "
                         "--one_by_one)")
    ap.add_argument("--weight_decay", type=float, default=None,
                    help="override optimizer_kwargs.weight_decay")
    ap.add_argument("--opt", default=None,
                    help="override the optimizer name (sgd | adam | adamw)")
    # DeiT init modes (reference train_fastmoe.py:109-121, 180)
    ap.add_argument("--backbone_random_init", action="store_true",
                    help="keep the backbone randomly initialized even when "
                         "--pretrained is given (reference 'scratch' mode)")
    ap.add_argument("--pos_emb_from_pretrained", action="store_true",
                    help="load (and interpolate) pos_embed from the torch "
                         "checkpoint; the reference default drops it "
                         "(common_config.py:36)")
    ap.add_argument("--use_weight_scaling", action="store_true",
                    help="sqrt(E*G^2/K) scaling for split-upcycled experts")
    ap.add_argument("--use_virtual_group_initialization", action="store_true",
                    help="accepted for reference-CLI compatibility: the "
                         "split-into-groups upcycling engages automatically "
                         "whenever expert_hidden < the dense MLP hidden "
                         "(utils/torch_interop.py)")
    # token-variant sharing knobs (reference train_fastmoe.py + token/)
    ap.add_argument("--share_gamma", type=float, default=None)
    ap.add_argument("--bootstrap_share_gamma", type=float, default=None)
    ap.add_argument("--bootstrap_first_moe",
                    type=lambda s: s.lower() not in ("0", "false", "no"),
                    default=None)
    ap.add_argument("--moe_data_distributed", action="store_true",
                    help="pure data parallelism: replicate experts instead "
                         "of sharding them (forces --n_expert 1)")
    # TAM level toggles (reference train_fastmoe.py:158-163)
    for i in range(3):
        ap.add_argument(f"--tam_level{i}", type=lambda s: s.lower() not in
                        ("0", "false", "no"), default=None)
    ap.add_argument("--vmoe_noisy_std", type=float, default=None)
    ap.add_argument("--moe_noisy_gate_loss_weight", type=float, default=0.01)
    ap.add_argument("--gate_task_specific_dim", type=int, default=None)
    ap.add_argument("--moe_capacity_factor", type=parse_capacity_factor,
                    default=None,
                    help="train dispatch capacity factor (a number, or "
                         "'nodrop' for provably-no-drop capacity)")
    ap.add_argument("--moe_eval_capacity_factor", type=parse_capacity_factor,
                    default=None,
                    help="eval dispatch capacity factor; 'nodrop' guarantees "
                         "the reference's never-drop semantics")
    ap.add_argument("--moe_drop_warn_threshold", type=float, default=0.01,
                    help="warn when the train-step mean dropped-slot "
                         "fraction exceeds this (the reference's ragged "
                         "dispatch never drops)")
    ap.add_argument("--allow_eval_drops", action="store_true",
                    help="do not fail eval when the static capacity drops "
                         "routing slots")
    ap.add_argument("--use_cv_loss", action="store_true", default=None)
    ap.add_argument("--no_pallas_ffn", action="store_true",
                    help="disable the fused Pallas expert-FFN kernel")
    ap.add_argument("--use_pallas_dense_ffn", action="store_true",
                    help="fused Pallas MLP kernel in the DENSE ViT blocks "
                         "too (hidden activation stays in VMEM; backward "
                         "recomputes it remat-style); default: on when "
                         "running on TPU, off elsewhere")
    ap.add_argument("--no_pallas_dense_ffn", action="store_true",
                    help="disable the fused Pallas MLP in the dense blocks")
    ap.add_argument("--use_pallas_ln_mlp", action="store_true",
                    help="fully fuse the dense blocks' LN+MLP+residual "
                         "sublayer into ONE Pallas kernel (ops/ln_mlp.py); "
                         "falls back per site when drop-path/dropout are "
                         "active; default off")
    ap.add_argument("--no_pallas_ln_mlp", action="store_true",
                    help="disable the fused LN+MLP+residual kernel (over a "
                         "YAML use_pallas_ln_mlp: true)")
    ap.add_argument("--scan_blocks", action="store_true",
                    help="lax.scan over (dense, MoE) block pairs: one "
                         "compiled pair program instead of depth/2 inlined "
                         "copies (params in the stacked blocks_scan layout; "
                         "convert checkpoints with utils.scan_params)")
    ap.add_argument("--use_checkpointing", action="store_true", default=None)
    ap.add_argument("--compute_dtype", default=None,
                    choices=[None, "bfloat16", "float32"])
    # mesh
    ap.add_argument("--n_data", type=int, default=1)
    ap.add_argument("--n_expert", type=int, default=None)
    ap.add_argument("--n_seq", type=int, default=1,
                    help="sequence-parallel mesh axis (Ulysses attention; "
                         "num_heads must be divisible by it)")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed (multi-host TPU pod; "
                         "the torchrun/slurm-launcher equivalent, reference "
                         "train_fastmoe.py:268-312)")
    # run control
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None,
                    help="override optimizer_kwargs.lr from the config "
                         "(reference train_fastmoe.py:122)")
    ap.add_argument("--trBatch", type=int, default=None)
    ap.add_argument("--accumulation_steps", type=int, default=None)
    ap.add_argument("--valBatch", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval", action="store_true", help="eval-only")
    ap.add_argument("--pretrained", default=None,
                    help="backbone params msgpack (pretrain export) or "
                         "reference DeiT .pth to warm-start from")
    ap.add_argument("--ref_ckpt", default=None,
                    help="reference-format MTL checkpoint to import before "
                         "training/eval: a single .pth file OR a rank-"
                         "sharded {rank}.pth DIRECTORY (merged like "
                         "reference train_fastmoe.py:525-556; expert_format "
                         "validated)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--ckp", default=None,
                    help="explicit checkpoint dir for --eval/--resume "
                         "(defaults to the run's checkpoint dir)")
    # mid-epoch checkpointing (TPU-first extension: the reference resumes at
    # epoch granularity only — SURVEY.md §5 "no mid-epoch checkpointing";
    # on preemptible TPU pods step-granularity resume is table stakes)
    ap.add_argument("--ckpt_every_steps", type=int, default=0,
                    help="save a mid-epoch step checkpoint every N optimizer "
                         "steps (0 = epoch granularity only); SIGTERM also "
                         "triggers a step checkpoint at the next step "
                         "boundary, then a clean exit (preemption-safe)")
    ap.add_argument("--stop_after_steps", type=int, default=0,
                    help="save a step checkpoint and exit after N global "
                         "optimizer steps (preemption drill; used by the "
                         "resume-equivalence test)")
    ap.add_argument("--dev_test", action="store_true",
                    help="run one eval before training")
    ap.add_argument("--save_predictions", action="store_true",
                    help="with --eval: write per-image predictions to "
                         "save_dir and score the files (reference "
                         "save_model_predictions/eval_all_results protocol)")
    ap.add_argument("--overfit", action="store_true")
    ap.add_argument("--synthetic", type=int, default=0, metavar="NBATCH",
                    help="train on N synthetic batches/epoch (no dataset needed)")
    ap.add_argument("--wandb", "--use_wandb", dest="wandb",
                    action="store_true")
    ap.add_argument("--wandb_project", default=None)
    ap.add_argument("--wandb_entity", default=None)
    ap.add_argument("--wandb_name", default=None,
                    help="wandb run name (defaults to --run_name)")
    ap.add_argument("--forward_hook", action="store_true",
                    help="dump layer I/O summaries for the first batch to "
                         "<output_dir>/forward_hook.log (reference "
                         "utils/tracing.py:56-210)")
    ap.add_argument("--flops", action="store_true",
                    help="print XLA-estimated FLOPs of one forward and exit")
    ap.add_argument("--time", dest="time_fwd", action="store_true",
                    help="print forward latency and exit")
    ap.add_argument("--profile_dir", default=None,
                    help="write a jax.profiler trace for the first train steps")
    ap.add_argument("--debug_nans", action="store_true",
                    help="enable jax_debug_nans: error at the first op that "
                         "produces a NaN (the sanitizer-mode equivalent of "
                         "the reference's sync-and-inspect debugging, "
                         "SURVEY.md §5)")
    ap.add_argument("--log_interval", type=int, default=25)
    ap.add_argument("--a2a_chunks", type=int, default=None,
                    help="pipeline the EP dispatch exchange over N groups "
                         "of local experts (moe/dispatch.py); compiles the "
                         "train step with xla_tpu_enable_async_all_to_all "
                         "so the split all_to_alls overlap expert GEMMs "
                         "on ICI (scripts/dump_ep_schedule.py evidence); "
                         "exact numerics at dropout 0")
    ap.add_argument("--loader_mode", default="auto",
                    choices=["auto", "processes", "threads"],
                    help="host data-loader backend: fork-pool processes "
                         "(default; the reference's multi-process "
                         "DataLoader equivalent) or the GIL-capped thread "
                         "pool (scripts/bench_loader.py has the numbers)")
    ap.add_argument("--platform", default=None,
                    choices=[None, "cpu", "tpu"],
                    help="force the jax backend (jax.config.update — the "
                         "JAX_PLATFORMS env var is fixed by sitecustomize "
                         "in some environments); combine with "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                         "for a virtual CPU mesh")
    return ap.parse_args(argv)


class SyntheticLoader:
    """Fixed set of synthetic batches (smoke mode).

    Batches stay device-resident: materializing them to numpy made every
    training step re-upload ~160 MB of one-hot labels host->device (the
    real-data path streams from disk, but synthetic smoke/perf runs should
    measure the step, not the transfer)."""

    def __init__(self, tasks, n_batches: int, batch_size: int, img_size):
        self.batches = [
            dict(synthetic_batch(jax.random.key(i), tasks, batch_size,
                                 img_size))
            for i in range(n_batches)
        ]
        for i, b in enumerate(self.batches):
            b["meta"] = [
                {"image": f"synth_{i}_{j}", "im_size": tuple(img_size)}
                for j in range(batch_size)
            ]

    def __len__(self):
        return len(self.batches)

    def epoch(self, epoch: int):
        yield from self.batches


def build_everything(args, p):
    n_chips = len(jax.devices())
    n_seq = getattr(args, "n_seq", 1) or 1
    n_expert = args.n_expert if args.n_expert is not None else max(
        n_chips // (args.n_data * n_seq), 1
    )
    mesh = None
    if args.n_data * n_seq * n_expert > 1:
        mesh = make_mesh(args.n_data, n_expert, n_seq=n_seq)
    model = build_model(p, mesh=mesh, expert_axis="expert" if mesh else None)
    # 'seq' devices shard the token axis, not the batch: the global batch
    # scales with the batch-sharding axes only (parallel.mesh.batch_sharding)
    return model, mesh, args.n_data * n_expert


def run(args) -> Dict:
    if args.platform:
        # must land before the first backend touch; the JAX_PLATFORMS env
        # var is pinned by sitecustomize in relay environments
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.multihost:
        # coordinator/process env comes from the TPU pod runtime
        jax.distributed.initialize()
        print(f"multihost: process {jax.process_index()}/{jax.process_count()}")
    overrides = {
        k: getattr(args, k)
        for k in ("moe_experts", "moe_top_k", "vmoe_noisy_std",
                  "gate_task_specific_dim", "moe_capacity_factor",
                  "moe_eval_capacity_factor", "epochs",
                  "trBatch", "valBatch", "compute_dtype", "save_dir",
                  "run_name", "accumulation_steps", "moe_gate_type",
                  "moe_mlp_ratio", "num_experts_pertask", "share_gamma",
                  "bootstrap_share_gamma", "bootstrap_first_moe")
        if getattr(args, k) is not None
    }
    for k in ("expert_prune", "regu_experts_fromtask", "regu_sem",
              "sem_force", "regu_subimage", "gate_input_ahead",
              "allow_eval_drops"):
        if getattr(args, k):
            overrides[k] = True
    if args.task_one_hot:
        # reference train_fastmoe.py:206-207: task-conditioned implies
        # one-by-one; conditioning itself needs the task-feature gate dim
        args.one_by_one = True
        if (args.gate_task_specific_dim or 0) <= 0:
            print("WARNING: --task_one_hot without --gate_task_specific_dim "
                  "> 0 leaves the gate unconditioned")
    # three-state flags: the YAML value wins unless the flag is given
    # (these were store_true stomps before — a config with multi_gate: True
    # run without --multi_gate silently trained the shared-gate path)
    for k in ("multi_gate", "use_cv_loss", "use_checkpointing"):
        if getattr(args, k) is not None:
            overrides[k] = getattr(args, k)
    if args.no_pallas_ffn:
        overrides["use_pallas_ffn"] = False
    if args.use_pallas_dense_ffn and args.no_pallas_dense_ffn:
        raise SystemExit(
            "--use_pallas_dense_ffn and --no_pallas_dense_ffn are "
            "contradictory; pass at most one")
    if args.use_pallas_dense_ffn:
        overrides["use_pallas_dense_ffn"] = True
    if args.no_pallas_dense_ffn:
        overrides["use_pallas_dense_ffn"] = False
    if args.use_pallas_ln_mlp and args.no_pallas_ln_mlp:
        raise SystemExit(
            "--use_pallas_ln_mlp and --no_pallas_ln_mlp are "
            "contradictory; pass at most one")
    if args.use_pallas_ln_mlp:
        overrides["use_pallas_ln_mlp"] = True
    if args.no_pallas_ln_mlp:
        overrides["use_pallas_ln_mlp"] = False
    if args.a2a_chunks is not None:
        overrides["moe_a2a_chunks"] = int(args.a2a_chunks)
    if args.scan_blocks:
        overrides["scan_blocks"] = True
    if args.stacked_tasks:
        overrides["stacked_tasks"] = True
    if args.scan_tasks:
        overrides["scan_tasks"] = True
    if args.no_scan_tasks_remat:
        overrides["scan_tasks_remat"] = False
    if args.shared_prefix:
        overrides["shared_prefix"] = True
    if args.remat_heads:
        overrides["remat_heads"] = True
    if args.overfit:
        overrides["overfit"] = True
    p = create_config(args.config_env, args.config_exp, overrides,
                      make_dirs=True)
    if sum(bool(p.get(k)) for k in
           ("stacked_tasks", "scan_tasks", "shared_prefix")) > 1:
        raise SystemExit("--stacked_tasks / --scan_tasks / --shared_prefix "
                         "are mutually exclusive multi-gate execution "
                         "strategies; pick one")
    if p.get("scan_tasks") and not p.get("multi_gate"):
        print("WARNING: scan_tasks has no effect without multi_gate; "
              "the shared-router forward already runs the backbone once")
    if p.get("shared_prefix"):
        if not p.get("multi_gate") and \
                int(p.get("gate_task_specific_dim", -1)) <= 0:
            print("WARNING: shared_prefix has no effect without per-task "
                  "routing (multi_gate or the task-conditioned shared "
                  "gate); the single-pass forward already runs the "
                  "backbone once")
            p["shared_prefix"] = False
        elif any(float((p.get("backbone_kwargs") or {}).get(k, 0) or 0) > 0
                 for k in ("drop_rate", "attn_drop_rate")):
            raise SystemExit(
                "--shared_prefix would share the prefix's train-time "
                "dropout draws across tasks (drop_rate/attn_drop_rate > 0); "
                "use the sequential loop or disable dropout")
    if (p.get("scan_blocks") or p.get("scan_tasks")
            or p.get("shared_prefix")) and \
            p.get("backbone") != "VisionTransformer_moe":
        print("WARNING: scan_blocks/scan_tasks/shared_prefix only apply to "
              "the VisionTransformer_moe backbone; ignored for "
              f"{p.get('backbone')}")
    if p.get("stacked_tasks") and not p.get("multi_gate"):
        print("WARNING: stacked_tasks has no effect without multi_gate; "
              "running the shared-gate path")
    if args.lr is not None:
        p["optimizer_kwargs"]["lr"] = args.lr
    if args.weight_decay is not None:
        p["optimizer_kwargs"]["weight_decay"] = args.weight_decay
    if args.opt is not None:
        p["optimizer"] = args.opt
    if any(getattr(args, f"tam_level{i}") is not None for i in range(3)):
        mk = dict(p.get("model_kwargs") or {})
        for i in range(3):
            v = getattr(args, f"tam_level{i}")
            if v is not None:
                mk[f"tam_level{i}"] = v
        p["model_kwargs"] = mk
    if args.moe_data_distributed:
        args.n_expert = 1
    setup_stdout_tee(p["output_dir"])
    logger = MetricLogger(p["output_dir"], use_wandb=args.wandb, config=p,
                          run_name=args.wandb_name or args.run_name,
                          project=args.wandb_project,
                          entity=args.wandb_entity)
    print(f"devices: {jax.devices()}")
    print(f"tasks: {p['TASK_NAMES']}")

    model, mesh, n_devices = build_everything(args, p)
    tasks = list(p["TASK_NAMES"])
    loss_fns = build_loss_fns(p)
    loss_weights = dict(
        (p.get("loss_kwargs") or {}).get("loss_weights", {t: 1.0 for t in tasks})
    )

    # data: per-device batch x number of mesh devices actually used
    batch_size = int(p.get("trBatch", 2)) * n_devices
    val_batch = int(p.get("valBatch", p.get("trBatch", 2))) * n_devices
    if args.synthetic:
        train_loader = SyntheticLoader(p["TASKS"], args.synthetic, batch_size,
                                       p["train_scale"])
        val_loader = SyntheticLoader(p["TASKS"], max(args.synthetic // 2, 1),
                                     val_batch, p["test_scale"])
    else:
        tr, ts = get_transformations(p)

        class _TDS:
            def __init__(self, ds, t, seed):
                self.ds, self.t, self.seed = ds, t, seed

            def __len__(self):
                return len(self.ds)

            def __getitem__(self, i):
                rng = np.random.RandomState(
                    (self.seed * 1_000_003 + i) % (2**31)
                )
                return self.t(self.ds[i], rng)

        nworkers = int(p.get("nworkers", 8))
        # 'auto' = fork-pool processes (the reference's multi-process
        # DataLoader equivalent; thread pools cap at ~2.5x from GIL-held
        # label/collate work — scripts/bench_loader.py).  nworkers <= 0
        # means in-process loading (torch DataLoader semantics): one
        # thread, no fork pool.
        use_procs = args.loader_mode in ("auto", "processes") and nworkers > 0
        nworkers = max(1, nworkers)
        train_loader = EpochLoader(
            _TDS(get_dataset(p, "train", None, overfit=p["overfit"]), tr,
                 args.seed),
            batch_size=batch_size, shuffle=True, seed=args.seed,
            num_workers=nworkers, use_processes=use_procs,
        )
        val_loader = EpochLoader(
            _TDS(get_dataset(p, "val", None, overfit=p["overfit"]), ts,
                 args.seed),
            batch_size=val_batch, shuffle=False, drop_last=False,
            num_workers=nworkers, use_processes=use_procs,
        )

    steps_per_epoch = max(len(train_loader), 1)
    epochs = int(p["epochs"])
    tx = build_optimizer(p, steps_per_epoch)

    sample = next(iter(train_loader.epoch(0)))
    sample = {k: v for k, v in sample.items() if k != "meta"}
    # sem-guided knobs add parameters (e.g. the regu_sem prior head) that
    # only materialize when the backbone sees `sem` — initialize with it
    use_sem = (args.regu_sem or args.sem_force or args.regu_subimage) \
        and "semseg" in tasks
    init_kwargs = {"sem": sample["semseg"]} if use_sem else {}
    if bool((p.get("model_kwargs") or {}).get("tam", False)):
        # TAM fusion modules only materialize parameters in train mode
        init_kwargs["train"] = True
    state = create_train_state(model, jax.random.key(args.seed), sample, tx,
                               train_kwargs=init_kwargs or None)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"parameters: {n_params/1e6:.2f}M, steps/epoch: {steps_per_epoch}")

    bsh = None
    if mesh is not None:
        state = shard_train_state(state, mesh)
        bsh = batch_sharding(mesh)

    if args.pretrained and args.backbone_random_init:
        # reference 'scratch' mode (resolve_deit_init_mode,
        # train_fastmoe.py:192-197): checkpoint given but backbone stays
        # randomly initialized
        print(f"backbone_random_init: ignoring {args.pretrained}")
    elif args.pretrained:
        state = state.replace(
            params=load_pretrained_backbone(
                state.params, args.pretrained, p,
                pos_emb_from_pretrained=args.pos_emb_from_pretrained,
                use_weight_scaling=args.use_weight_scaling,
            )
        )
        print(f"loaded pretrained backbone from {args.pretrained}")

    if args.ref_ckpt:
        # reference checkpoint interop: single file or rank-sharded
        # directory (train_fastmoe.py:525-556), full MTL tree
        from m3vit_tpu.utils.torch_interop import (
            load_reference_checkpoint,
            merge_into,
            reference_mtl_sd_to_params,
            validate_reference_moe_checkpoint,
        )

        ckpt, sd = load_reference_checkpoint(args.ref_ckpt)
        validate_reference_moe_checkpoint(
            ckpt, sd, int(p.get("moe_experts", 16)), args.ref_ckpt)
        kw = p.get("backbone_kwargs") or {}
        mg_tasks = len(tasks) if p.get("multi_gate") else 0
        loaded, bstats = reference_mtl_sd_to_params(
            sd, tasks, depth=int(kw.get("depth", 12)),
            multi_gate_tasks=mg_tasks)
        merged, missing = merge_into(state.params, loaded)
        new_bs = state.batch_stats
        if bstats and state.batch_stats:
            new_bs, _ = merge_into(state.batch_stats, bstats)
        state = state.replace(params=merged, batch_stats=new_bs)
        print(f"imported reference checkpoint {args.ref_ckpt} "
              f"(epoch={ckpt.get('epoch')}, "
              f"missing={len(missing)}{': ' + str(missing[:3]) if missing else ''})")

    if mesh is not None and (args.pretrained or args.ref_ckpt):
        # --pretrained/--ref_ckpt merged host numpy arrays into a state that
        # shard_train_state had already placed; re-apply the explicit
        # shardings so global expert banks don't enter jit host-staged
        # and unsharded on a multi-chip mesh.
        state = shard_train_state(state, mesh)

    start_epoch = 0
    skip_iters = 0
    step_ckpt_dir = os.path.join(p["output_dir"], "step_checkpoint")
    if args.resume or args.eval:
        ckpt_dir = args.ckp or p["checkpoint_dir"]
        restored, meta = restore_checkpoint(ckpt_dir, state)
        if restored is not None:
            state = restored
            start_epoch = int(meta.get("epoch", -1)) + 1
            print(f"resumed from epoch {start_epoch - 1}")
        elif args.eval:
            raise FileNotFoundError(f"--eval needs a checkpoint in {ckpt_dir}")
    if args.resume and not args.eval and args.ckp is None:
        # step-granularity resume: prefer the run's own mid-epoch checkpoint
        # when it is newer than the last epoch checkpoint (an explicit --ckp
        # always wins — the user asked for THAT state).  Exactness: the
        # loader is deterministic in (seed, epoch) and the step rng is
        # folded with state.step, so restarting at (epoch, next_it) replays
        # the uninterrupted trajectory bit-for-bit
        # (tests/test_step_resume.py).  skip_iters == steps_per_epoch means
        # the epoch's steps all ran but its end-of-epoch eval/checkpoint did
        # not: re-enter that epoch with zero iterations so they still do.
        s_restored, s_meta = restore_checkpoint(step_ckpt_dir, state)
        if s_restored is not None:
            s_epoch = int(s_meta["epoch"])
            s_next = int(s_meta["next_it"])
            if s_epoch * steps_per_epoch + s_next > start_epoch * steps_per_epoch:
                state = s_restored
                start_epoch, skip_iters = s_epoch, s_next
                print(f"resumed mid-epoch: epoch {s_epoch} iter {s_next}")

    if args.forward_hook:
        # layer I/O dump for cross-framework diffing (reference
        # utils/tracing.py:56-210 writes forward_hook.log)
        from m3vit_tpu.utils.tracing import dump_trace, trace_model

        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        traces = trace_model(model, variables, sample["image"], train=False)
        hook_path = f"{p['output_dir']}/forward_hook.log"
        dump_trace(traces, hook_path)
        print(f"[forward_hook] {len(traces)} layer summaries -> {hook_path}")

    # cv loss only when enabled (reference gates it on args.use_cv_loss,
    # train_utils.py:440-449)
    cv_w = float(args.moe_noisy_gate_loss_weight) if p.get("use_cv_loss") \
        else 0.0
    # token variant: the shareability-predictor gumbel temperature can follow
    # a per-epoch schedule (reference train_fastmoe.py:628-632)
    from m3vit_tpu.train.optim import share_pred_temperature

    is_token = "Token" in str(p.get("backbone", "")) \
        or p.get("model") == "token_moe"
    use_share_temp = is_token and share_pred_temperature(p, 0) is not None
    # pipelined EP exchange: the split a2as only overlap expert GEMMs if
    # the TPU compiler issues them async (default compiles are fully
    # synchronous — scripts/dump_ep_schedule.py)
    # (enabled for ANY ep>1 run: with the flag even the monolithic
    # exchange compiles to start/done pairs with compute scheduled inside
    # — 70/80 windows in the 8-chip AOT program; chunks add intra-site
    # granularity on top)
    copts = None
    if mesh is not None and mesh.shape.get("expert", 1) > 1 \
            and jax.default_backend() in ("tpu", "axon"):
        copts = {"xla_tpu_enable_async_all_to_all": True}
    train_step = make_train_step(model, tasks, loss_fns, loss_weights,
                                 cv_weight=cv_w,
                                 pass_share_temp=use_share_temp,
                                 analysis_metrics=True,
                                 compiler_options=copts)
    # sem-guided knobs run only during warmup epochs with semseg labels fed
    # to the backbone (reference train_utils.py:424-426); a second compiled
    # step carries the extra input + regu losses (use_sem computed above)
    train_step_sem = None
    if use_sem:
        train_step_sem = make_train_step(
            model, tasks, loss_fns, loss_weights, cv_weight=cv_w,
            pass_sem=True, semregu_weight=float(args.semregu_loss_weight),
            subimage_weight=float(args.subimageregu_weight),
            analysis_metrics=True,
        )
    obo_grad_fns = obo_apply = None
    if args.one_by_one:
        from m3vit_tpu.train.step import make_one_by_one_train_step

        obo_grad_fns, obo_apply = make_one_by_one_train_step(
            model, tasks, loss_fns, loss_weights, cv_weight=cv_w
        )
    # stats-carrying eval step: evaluate_online enforces the reference's
    # no-drop semantics on dropped_slot_fraction (see _DropGuard)
    eval_step = make_eval_step(model, tasks, with_stats=True)

    def run_eval(epoch: int) -> Dict:
        batches = val_loader.epoch(epoch)
        if bsh is not None:
            batches = (pad_batch(b, val_batch) for b in batches)
            batches = device_put_batches(batches, bsh)
        results = evaluate_online(p, eval_step, state, batches, epoch)
        logger.log_val_performance(results, epoch)
        print(f"[epoch {epoch}] val: "
              + ", ".join(f"{t}={results[t]}" for t in tasks))
        if "multi_task_performance" in results:
            print(f"[epoch {epoch}] Δm = "
                  f"{100 * results['multi_task_performance']:.2f}%")
        return results

    if args.flops or args.time_fwd:
        # --flops / --time (reference main.py:97-108, train_fastmoe.py:515-522)
        import time as _t

        from m3vit_tpu.utils.tracing import flops_of

        img = sample["image"][:1]

        def fwd(params, x):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            pred, _, _ = model.apply(variables, x, train=False)
            return pred[tasks[0]]

        if args.flops:
            f = flops_of(fwd, state.params, img)
            print(f"forward FLOPs (XLA estimate, batch=1): "
                  f"{f/1e9:.2f} G" if f else "cost analysis unavailable")
        if args.time_fwd:
            jf = jax.jit(fwd)
            _ = float(jnp.sum(jf(state.params, img)))
            t0 = _t.perf_counter()
            for _i in range(5):
                r = jf(state.params, img)
            _ = float(jnp.sum(r))
            print(f"forward latency: {(_t.perf_counter()-t0)/5*1000:.1f} ms")
        return {}

    if args.eval:
        if args.save_predictions:
            from m3vit_tpu.evaluation.orchestrate import (
                eval_saved_predictions,
                save_model_predictions,
            )

            batches = val_loader.epoch(start_epoch)
            if bsh is not None:
                batches = (pad_batch(b, val_batch) for b in batches)
                batches = device_put_batches(batches, bsh)
            save_dir = save_model_predictions(p, eval_step, state, batches)
            print(f"predictions written to {save_dir}")
            if not args.synthetic:
                ts = get_transformations(p)[1]
                ds = get_dataset(p, "val", None, overfit=p["overfit"])
                results = eval_saved_predictions(p, save_dir, ds)
                logger.log_val_performance(results, start_epoch)
                print("file-protocol results:", _plain(results))
                return results
            return {}
        return run_eval(start_epoch)
    if args.dev_test:
        run_eval(start_epoch)

    eval_interval = int(p.get("eval_interval", 1))
    final10 = bool(p.get("eval_final_10_epochs_only", False))
    best: Optional[Dict] = None
    rng = jax.random.key(args.seed + 1)
    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        # preemption notice: finish the in-flight step, checkpoint, exit
        preempted["flag"] = True

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not in the main thread (library embedding)

    from m3vit_tpu.train.optim import build_schedule

    lr_schedule = build_schedule(p, steps_per_epoch)

    for epoch in range(start_epoch, epochs):
        t_epoch = time.time()
        seen = 0
        # reference per-epoch logging surface: epoch counter, adjusted lr
        # (wandb_logger.py:302-323) + device/host memory (TPU-first)
        logger.log_epoch(epoch)
        logger.log_learning_rate(
            float(lr_schedule(epoch * steps_per_epoch)),
            epoch * steps_per_epoch)
        logger.log_memory(epoch * steps_per_epoch)
        batches = train_loader.epoch(epoch)
        it0 = skip_iters if epoch == start_epoch else 0
        if it0:
            # skip BEFORE device_put so fast-forwarded batches are never
            # transferred host->device
            batches = itertools.islice(batches, it0, None)
        if bsh is not None:
            batches = device_put_batches(batches, bsh)
        t_win = time.time()
        profiling = args.profile_dir and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(args.profile_dir)
        step_fn = train_step
        if use_sem and epoch < args.warmup_epochs:
            step_fn = train_step_sem
        share_temp = None
        if use_share_temp:
            t = share_pred_temperature(p, epoch)
            share_temp = jnp.float32(t)
            print(f"[epoch {epoch}] share_pred temperature = {t:.4f}")
        for it, batch in enumerate(batches, start=it0):
            batch = {k: v for k, v in batch.items() if k != "meta"}
            if args.one_by_one:
                grads_sum, merged_bs = None, {}
                metrics = {"loss_total": 0.0}
                for t in tasks:
                    g, m, bs = obo_grad_fns[t](state, batch, rng)
                    grads_sum = g if grads_sum is None else jax.tree.map(
                        jnp.add, grads_sum, g
                    )
                    metrics["loss_total"] = metrics["loss_total"] \
                        + m.pop("loss_total")
                    metrics.update(m)
                    # each pass only runs task t's decoder: take that
                    # decoder's BN stats from its own pass
                    for k, v in (bs or {}).items():
                        if k == f"decoders_{t}" or k not in merged_bs:
                            merged_bs[k] = v
                state = obo_apply(state, grads_sum, merged_bs)
            elif share_temp is not None:
                state, metrics = step_fn(state, batch, rng, share_temp)
            else:
                state, metrics = step_fn(state, batch, rng)
            if profiling and it == 2:
                jax.profiler.stop_trace()
                profiling = False
            seen += batch_size
            if (it + 1) % args.log_interval == 0:
                loss = float(metrics["loss_total"])  # sync point
                dt = time.time() - t_win
                ips = args.log_interval * batch_size / dt
                t_win = time.time()
                step = epoch * steps_per_epoch + it
                logger.log_train_losses(
                    {k: (v.tolist() if getattr(v, "ndim", 0) else float(v))
                     for k, v in metrics.items()}
                    | {"throughput_images_per_sec": ips}, epoch, step)
                print(f"[epoch {epoch} it {it+1}/{steps_per_epoch}] "
                      f"loss={loss:.4f} ips={ips:.1f}")
                drop = float(metrics.get("moe_dropped_frac", 0.0))
                if drop > args.moe_drop_warn_threshold:
                    print(f"WARNING: mean MoE dropped-slot fraction "
                          f"{drop:.3f} > {args.moe_drop_warn_threshold} — "
                          f"raise moe_capacity_factor (or use 'nodrop'); "
                          f"the reference's ragged dispatch never drops")
            global_step = epoch * steps_per_epoch + it + 1
            stop_now = preempted["flag"] or (
                args.stop_after_steps and global_step >= args.stop_after_steps
            )
            periodic = (args.ckpt_every_steps
                        and (it + 1) % args.ckpt_every_steps == 0
                        and it + 1 < steps_per_epoch)
            if periodic or stop_now:
                save_checkpoint(step_ckpt_dir, state, global_step,
                                {"epoch": epoch, "next_it": it + 1,
                                 "mid_epoch": True})
            if stop_now:
                why = "SIGTERM" if preempted["flag"] else "--stop_after_steps"
                print(f"[{why}] step checkpoint saved at epoch {epoch} "
                      f"iter {it + 1} -> {step_ckpt_dir}; exiting")
                return {"stopped_at_step": global_step}
        # epoch end: final loss sync (a fully-trained resumed epoch —
        # skip_iters == steps_per_epoch — runs zero iterations here and goes
        # straight to its pending eval/checkpoint)
        if it0 < steps_per_epoch:
            loss = float(metrics["loss_total"])
            print(f"[epoch {epoch}] done in {time.time()-t_epoch:.1f}s "
                  f"loss={loss:.4f}")

        # reference policy (train_fastmoe.py:643-657): eval every
        # eval_interval epochs; with eval_final_10_epochs_only, only within
        # the last 10 epochs (the final epoch always evaluates)
        do_eval = ((epoch + 1) % eval_interval == 0) or epoch == epochs - 1
        if final10 and epoch < epochs - 10 and epoch != epochs - 1:
            do_eval = False
        if do_eval:
            results = run_eval(epoch)
            best, improved = validate_results(p, results, best)
            if improved:
                save_checkpoint(p["best_model_dir"], state, epoch,
                                {"results": _plain(results)})
                logger.log_best(results, epoch)
        save_checkpoint(p["checkpoint_dir"], state, epoch)

    return {"best": best}


def load_pretrained_backbone(params, path, p,
                             pos_emb_from_pretrained: bool = True,
                             use_weight_scaling: bool = False):
    """Merge pretrained backbone weights into the param tree.

    .msgpack -> our pretrain export (flax serialized backbone subtree);
    .pth     -> reference/DeiT torch checkpoint via torch_interop (pos-embed
                interpolated, dense MLPs upcycled into experts when needed).
    pos_emb_from_pretrained=False drops pos_embed from a torch checkpoint
    (reference common_config.py:36); msgpack exports always carry it.
    """
    import jax

    from m3vit_tpu.utils.torch_interop import merge_into

    template = params["backbone"]
    if path.endswith(".msgpack"):
        from flax import serialization

        with open(path, "rb") as f:
            loaded = serialization.from_bytes(
                jax.tree.map(lambda x: x, template), f.read()
            )
        merged, missing = merge_into(template, loaded)
    else:
        from m3vit_tpu.utils.torch_interop import (
            deit_to_backbone_params,
            load_torch_state_dict,
        )

        kw = p.get("backbone_kwargs") or {}
        depth = int(kw.get("depth", 12))
        embed = int(kw.get("embed_dim", 384))
        ratio = float(kw.get("moe_mlp_ratio", p.get("moe_mlp_ratio", 1.0)))
        grid = (
            int(kw.get("img_size", [512, 512])[0]) // int(kw.get("patch_size", 16)),
            int(kw.get("img_size", [512, 512])[1]) // int(kw.get("patch_size", 16)),
        )
        sd = load_torch_state_dict(path)
        loaded = deit_to_backbone_params(
            sd, depth=depth,
            num_experts=int(p.get("moe_experts", 16)),
            expert_hidden=int(embed * ratio),
            top_k=int(p.get("moe_top_k", 4)),
            target_grid=grid,
            use_weight_scaling=use_weight_scaling,
        )
        if not pos_emb_from_pretrained:
            loaded.pop("pos_embed", None)
        merged, missing = merge_into(template, loaded)
    if missing:
        print(f"[pretrained] kept random init for {len(missing)} tensors "
              f"(e.g. {missing[:4]})")
    new = dict(params)
    new["backbone"] = merged
    return new


def _plain(d):
    if isinstance(d, dict):
        return {k: _plain(v) for k, v in d.items()}
    if isinstance(d, (list, tuple)):
        return [_plain(v) for v in d]
    try:
        return float(d)
    except Exception:
        return d


def main(argv=None):
    run(parse_args(argv))


if __name__ == "__main__":
    main()
