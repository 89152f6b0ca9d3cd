"""Benchmark: flagship training-step throughput on the available chip(s).

Measures images/sec/chip for the reference's headline config — ViT-small-MoE
(E=16, K=4), multi-gate, 5-task PASCAL-Context, 512x512 — one full training
step (all 5 per-task router passes + 5 PUP heads + backward + SGD update).
Reference throughput logging: /root/reference/train/train_utils.py:499-505.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline: ratio vs the north-star target of 3x the A100+fastmoe per-chip
throughput.  The reference publishes no throughput logs (BASELINE.md); we
anchor on an estimated 8 img/s/chip for A100+fastmoe on this exact workload
(5 backbone passes/step; the reference trained with trBatch 4 on 2 GPUs,
run_exps.sh) -> target = 24 img/s/chip.  vs_baseline >= 1.0 meets the target.
The estimate's full arithmetic (measured 2.69 TFLOP/image x assumed ~7%
reference MFU on a 312 TFLOP/s A100) and its sensitivity table live in
BASELINE.md "The vs_baseline anchor's arithmetic".  The measured anchor is
the "mfu" field (XLA cost analysis / v5e peak).

Time-to-JSON is bounded (round-3 post-mortem: the driver's run hit its
timeout while the flagship program was still compiling, rc=124, no JSON):
  * every phase is stamped to stderr so a truncated run shows where it died;
  * the compiled executable from the cost-analysis `.lower().compile()` is
    executed directly (AOT), skipping the second trace + 197MB cache reload
    the old `step(...)` call paid;
  * a sentinel (/root/.jax_cache/m3vit_bench_sentinel.json) records the
    lowered-HLO hash of the last successfully-benched program; on a sentinel
    miss with a small budget (M3VIT_BENCH_BUDGET_S, default 1200) the bench
    falls back to the --scan_tasks variant, which compiles 4-8x faster, and
    says so in the metric name rather than emitting nothing;
  * a watchdog thread prints the best-available JSON at the budget deadline
    if the main path has not printed yet (suffix "_partial" when the timed
    loop did not complete).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import threading
import time

# Pin the Python hash seed BEFORE jax loads: str-hash randomization leaks
# into the Pallas/Mosaic kernel serialization (set/dict ordering), making
# the lowered program differ BYTE-WISE between processes (measured r4:
# fh_a vs fh_b dumps diverge inside tpu_custom_call backend_config;
# identical under PYTHONHASHSEED=0).  Without this the HLO-hash sentinel
# flutters and every run pays a fresh (partially server-cached) compile.
if (__name__ == "__main__"
        and os.environ.get("PYTHONHASHSEED") != "0"):
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

T0 = time.time()

import jax
import jax.numpy as jnp

TARGET_IMGS_PER_SEC_PER_CHIP = 24.0  # 3x estimated A100+fastmoe (see docstring)
V5E_PEAK_BF16_FLOPS = 197e12  # TPU v5e public peak, bf16/chip — MFU denominator

SENTINEL = "/root/.jax_cache/m3vit_bench_sentinel.json"

# persistent compile cache: the flagship step takes ~35 min to compile cold
# on the axon relay, ~instant afterwards
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def log(msg: str) -> None:
    print(f"[bench +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


# shared progress state, read by the watchdog thread
_PROGRESS = {
    "record": None,        # best-available JSON record so far
    "printed": False,      # final JSON already emitted
    "in_compile": False,   # never hard-exit mid-compile (TPU wedge hazard)
}
_PRINT_LOCK = threading.Lock()


def _emit(record: dict) -> None:
    with _PRINT_LOCK:
        if _PROGRESS["printed"]:
            return
        _PROGRESS["printed"] = True
        print(json.dumps(record), flush=True)
    try:  # post-mortem copy for the next session
        with open("BENCH_LAST.json", "w") as f:
            json.dump(record, f)
    except OSError:
        pass


def _watchdog(budget_s: float) -> None:
    time.sleep(budget_s)
    if _PROGRESS["printed"]:
        return
    rec = _PROGRESS["record"]
    if rec is None:
        log(f"WATCHDOG: budget {budget_s:.0f}s exceeded before any "
            f"measurement (in_compile={_PROGRESS['in_compile']}); no JSON "
            "to emit — see phase log above for where time went")
        return
    log(f"WATCHDOG: budget {budget_s:.0f}s exceeded — emitting best-available "
        "measurement")
    _emit(rec)
    if not _PROGRESS["in_compile"]:
        os._exit(0)  # rc 0 so the driver records the parsed line


def _read_sentinel() -> dict:
    try:
        with open(SENTINEL) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _sentinel_hashes(name: str) -> list:
    v = _read_sentinel().get(name, [])
    return [v] if isinstance(v, str) else list(v)


def _write_sentinel(name: str, hlo_hash: str) -> None:
    # a LIST of known-warm program hashes: the real-init and cached-shape
    # fast-init states lower to different HLO (layouts), and both programs
    # stay warm in the persistent compile cache
    s = _read_sentinel()
    hashes = _sentinel_hashes(name)
    if hlo_hash not in hashes:
        hashes.append(hlo_hash)
    s[name] = hashes
    try:
        with open(SENTINEL, "w") as f:
            json.dump(s, f)
    except OSError:
        pass


def _hlo_hash(lowered) -> str:
    # deterministic per (program, jax version); cheap vs a cold compile
    txt = lowered.as_text()
    return hashlib.sha256(txt.encode()).hexdigest()[:32]


class _SD:
    """(shape, dtype) leaf for the cached state shape tree.  Persisted as a
    plain ('__sd__', shape, dtype) tuple so the pickle has no dependency on
    this module's import name (a class-based leaf written by one loader
    namespace is unreadable from another — bitten r4)."""

    def __init__(self, shape, dtype):
        self.shape = tuple(shape)
        self.dtype = str(dtype)


def _sd_to_tuple(sd: "_SD"):
    return ("__sd__", list(sd.shape), sd.dtype)


def _sd_from_obj(x):
    if isinstance(x, _SD):
        return x
    if isinstance(x, (tuple, list)) and len(x) == 3 and x[0] == "__sd__":
        return _SD(x[1], x[2])
    raise ValueError(f"not a shape leaf: {x!r}")


def _shapes_path(layout_key: str) -> str:
    # keyed by PARAM LAYOUT, not the full metric: every bench variant except
    # scan_blocks shares one param tree, so a cold-host fallback rebuild can
    # reuse the shapes saved by the first (flagship) init
    key = hashlib.sha256(layout_key.encode()).hexdigest()[:16]
    return f"/root/.jax_cache/m3vit_bench_shapes_{key}.pkl"


def _is_sd(x):
    return isinstance(x, _SD)


def _make_state(model, batch, tx, layout_key, mesh):
    """TrainState for the bench.  Real flax init traces+compiles+runs the
    whole forward (~6 min of the warm path, measured r4); the step's
    TIMING depends only on shapes (static dispatch/attention/GEMMs), so
    after one real init we cache the state's shape tree and later runs
    materialize a zero-filled state in one tiny jitted program instead.
    Same avals/computation either way; the lowered text can differ in
    input layouts/ordering (the sentinel keeps a hash LIST for this, and
    XLA's persistent-cache key is robust to it — measured r4)."""
    import pickle

    from m3vit_tpu.train.state import TrainState, create_train_state

    path = _shapes_path(layout_key)
    saved = None
    try:
        with open(path, "rb") as f:
            saved = pickle.load(f)
    except Exception:  # missing/corrupt/format-mismatch -> treat as cold
        saved = None

    if saved is not None:
        log("fast init from cached shape tree")

        def _leaf(x):
            return _is_sd(x) or (isinstance(x, (tuple, list)) and x
                                 and x[0] == "__sd__")

        def build():
            zeros = jax.tree.map(
                lambda x: (lambda sd: jnp.zeros(sd.shape, sd.dtype))(
                    _sd_from_obj(x)),
                saved, is_leaf=_leaf)
            return TrainState.create(
                apply_fn=model.apply, params=zeros["params"], tx=tx,
                batch_stats=zeros["batch_stats"])

        return jax.jit(build)(), path, False

    log("initializing train state (params on device; caching the shape "
        "tree for later runs)")
    p_rng = jax.random.key(1)
    state = create_train_state(model, p_rng, batch, tx)
    # save IMMEDIATELY (not only on bench success): shapes are valid the
    # moment init returns, and a cold-host scan_tasks fallback rebuild must
    # not pay the ~6-min real init a second time
    _save_shapes(state, path)
    return state, path, False


def _save_shapes(state, path) -> None:
    import pickle

    def leaf(x):
        return _sd_to_tuple(_SD(x.shape, x.dtype))

    tree = {
        "params": jax.tree.map(leaf, state.params),
        "batch_stats": jax.tree.map(leaf, state.batch_stats),
    }
    try:
        with open(path, "wb") as f:
            pickle.dump(tree, f)
    except OSError:
        pass


def build_and_measure(args, scan_tasks_fallback: bool, budget_s: float):
    from __graft_entry__ import build_flagship
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.losses.functions import loss_fn_for_task
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.step import make_train_step

    n_chips = len(jax.devices())
    batch_per_chip = args.batch
    batch_size = batch_per_chip * n_chips

    mesh = None
    expert_axis = None
    if n_chips > 1:
        from m3vit_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=1, n_expert=n_chips)
        expert_axis = "expert"

    scan_tasks = args.scan_tasks or scan_tasks_fallback

    # remat off: B=8/chip fits in v5e HBM without it, and full-block remat
    # costs ~18% step time (perf matrix in git history)
    # cf=1.25: the standard TPU MoE capacity; training-health-validated
    # against cf=2.0 (identical 300-step trajectories, scripts/train_health.py)
    log("building model")
    model, tasks = build_flagship(
        mesh=mesh, expert_axis=expert_axis, dtype=jnp.bfloat16,
        use_checkpointing=False, capacity_factor=1.25,
        remat_heads=args.remat_heads,
        # None = backend auto-detect (kernel on TPU, Dense path elsewhere);
        # forcing True off-TPU would hit the slow interpret path (ADVICE r2)
        use_pallas_dense_ffn=False if args.no_dense_pallas else None,
        use_pallas_ln_mlp=args.ln_mlp,
        scan_tasks=scan_tasks, scan_blocks=args.scan_blocks,
        # shared task-independent prefix (exact numerics at the flagship
        # point: dropout 0); mutually exclusive with the scan strategies
        shared_prefix=not (args.no_shared_prefix or scan_tasks
                           or args.scan_blocks),
    )
    batch = synthetic_batch(jax.random.key(0), tasks, batch_size, (512, 512))

    suffix = "" if batch_per_chip == 8 else f"_b{batch_per_chip}"
    if scan_tasks:
        suffix += "_scan_tasks"
    if scan_tasks_fallback:
        suffix += "_coldfallback"
    if args.scan_blocks:
        suffix += "_scan_blocks"
    if args.no_dense_pallas:
        suffix += "_no_dense_pallas"
    if args.remat_heads:
        suffix += "_remat_heads"
    if args.no_shared_prefix:
        suffix += "_no_shared_prefix"
    if args.ln_mlp:
        suffix += "_ln_mlp"
    metric = "train_throughput_vit_small_moe_e16k4_5task_512" + suffix

    p = {
        "optimizer": "sgd",
        "optimizer_kwargs": {"lr": 0.002, "momentum": 0.9, "weight_decay": 1e-4},
        "scheduler": "poly",
        "epochs": 100,
    }
    tx = build_optimizer(p, steps_per_epoch=100)
    layout_key = "scan_blocks" if args.scan_blocks else "default"
    state, _, _ = _make_state(model, batch, tx, layout_key, mesh)
    if mesh is not None:
        from m3vit_tpu.parallel.mesh import batch_sharding, shard_train_state

        state = shard_train_state(state, mesh)
        bsh = batch_sharding(mesh)
        batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}

    loss_fns = {t.name: loss_fn_for_task(t.name, {"edge_w": 0.95}) for t in tasks}
    weights = {"semseg": 1.0, "human_parts": 2.0, "sal": 5.0, "edge": 50.0,
               "normals": 10.0}
    step = make_train_step(model, [t.name for t in tasks], loss_fns, weights,
                           donate=True)

    rng = jax.random.key(2)

    log("tracing/lowering the train step")
    lowered = step.lower(state, batch, rng)
    hlo_hash = _hlo_hash(lowered)
    warm = hlo_hash in _sentinel_hashes(metric)
    elapsed = time.time() - T0
    log(f"lowered; hlo_hash={hlo_hash} sentinel_warm={warm} "
        f"budget_left={budget_s - elapsed:.0f}s")

    if getattr(args, "dump_hlo", None):
        with open(args.dump_hlo, "w") as f:
            f.write(lowered.as_text())
        log(f"wrote lowered program to {args.dump_hlo}")

    if getattr(args, "check_only", False):
        # warm-cache guard (round-4 VERDICT weak #3): a changed default
        # program without a deliberate re-warm would make the next driver
        # bench fall back to scan_tasks or a watchdog partial.  This mode
        # stops after hashing — no compile, no TPU step — and fails LOUDLY
        # when the default program is not sentinel-warm.
        rec = {"metric": "bench_warm_check", "warm": warm,
               "hlo_hash": hlo_hash, "bench_metric": metric}
        print(json.dumps(rec), flush=True)
        if not warm:
            log("COLD: the default bench program is not sentinel-warm. "
                "Re-warm it BEFORE relying on the default budget:\n"
                "    python bench.py --budget_s 7200 --no_fallback\n"
                "(one ~35-min cold compile; afterwards the persistent "
                "cache + sentinel make the driver bench ~2-4 min)")
            sys.exit(3)
        sys.exit(0)

    if (not warm and not scan_tasks_fallback and not args.no_fallback
            and budget_s - elapsed < 1800):
        # A cold flagship compile (~35 min on the axon relay) will not fit.
        # The sentinel can be stale-cold (program changed or first run on
        # this host); measure the 4-8x-faster-compiling scan_tasks variant
        # instead of emitting nothing.  (round-3 VERDICT item 1)
        log("sentinel MISS with tight budget -> falling back to the "
            "scan_tasks variant (fast compile)")
        return None  # caller rebuilds with scan_tasks_fallback=True

    # measured FLOP count of the full compiled step (fwd+bwd+SGD) via XLA
    # cost analysis — the basis for the honest MFU number (VERDICT r2 #3).
    # Custom Pallas kernels contribute their declared cost estimates
    # (ops/flash_attention.py, ops/expert_ffn.py).
    log("compiling (persistent cache: /root/.jax_cache)")
    _PROGRESS["in_compile"] = True
    compiled = lowered.compile()
    _PROGRESS["in_compile"] = False
    log("compiled")

    if getattr(args, "compile_stats", False):
        # HBM accounting mode (B=16 audit): print XLA's memory analysis of
        # the compiled program and exit without touching the device
        try:
            ma = compiled.memory_analysis()
            rec = {"metric": "compile_stats", "bench_metric": metric,
                   "hlo_hash": hlo_hash}
            for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes", "alias_size_in_bytes",
                      "generated_code_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    rec[k] = int(v)
            print(json.dumps(rec), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": "compile_stats",
                              "error": str(e)[:200]}), flush=True)
        sys.exit(0)

    # XLA cost analysis counts a lax.scan body ONCE, not x trip-count, so
    # flops/mfu would be nonsense for the scan variants — skip them there.
    step_flops = None
    if not (scan_tasks or args.scan_blocks):
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            step_flops = float(ca.get("flops", -1.0))
            if step_flops <= 0:
                step_flops = None
        except Exception:
            step_flops = None

    def mk_record(step_s: float, n_timed: int) -> dict:
        imgs_per_sec = batch_size / step_s
        per_chip = imgs_per_sec / n_chips
        rec = {
            "metric": metric if n_timed > 0 else metric + "_partial",
            "value": round(per_chip, 3),
            "unit": "images/sec/chip",
            # vs the ESTIMATED 24 img/s/chip target (see docstring); the
            # measured anchor is the mfu field below
            "vs_baseline": round(per_chip / TARGET_IMGS_PER_SEC_PER_CHIP, 4),
            "step_ms": round(step_s * 1000.0, 1),
        }
        if step_flops is not None:
            achieved = step_flops / step_s / n_chips
            rec["tflops_per_sec_per_chip"] = round(achieved / 1e12, 1)
            rec["mfu"] = round(achieved / V5E_PEAK_BF16_FLOPS, 4)
        return rec

    # warmup; float() is the barrier (block_until_ready is not reliable
    # under the axon loopback relay).  AOT-execute the compiled object —
    # a fresh `step(...)` call would re-trace and re-load the executable.
    log("warmup (2 steps)")
    tw = time.perf_counter()
    for _ in range(2):
        state, metrics = compiled(state, batch, rng)
    float(metrics["loss_total"])
    warm_step_s = (time.perf_counter() - tw) / 2
    _PROGRESS["record"] = mk_record(warm_step_s, 0)
    log(f"warmup done ({warm_step_s * 1000:.1f} ms/step incl. dispatch)")

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = compiled(state, batch, rng)
    float(metrics["loss_total"])
    dt = time.perf_counter() - t0

    record = mk_record(dt / n_steps, n_steps)
    _PROGRESS["record"] = record
    _write_sentinel(metric, hlo_hash)
    return record


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="per-chip batch (8 = the operating point the "
                         "driver measures)")
    ap.add_argument("--no_dense_pallas", action="store_true",
                    help="A/B: disable the fused Pallas MLP in the dense "
                         "blocks (28.2 img/s vs 29.0 with it, v5e-1)")
    ap.add_argument("--scan_tasks", action="store_true",
                    help="A/B: lax.scan the per-task passes (scan-of-remat; "
                         "compile-time lever — see PARITY.md)")
    ap.add_argument("--scan_blocks", action="store_true",
                    help="A/B: lax.scan the dense/MoE block pairs")
    ap.add_argument("--remat_heads", action="store_true",
                    help="A/B: rematerialize the PUP decoder heads in "
                         "backward (their full-res conv activations "
                         "dominate HBM; candidate for the B=16 remat tax)")
    ap.add_argument("--ln_mlp", action="store_true",
                    help="A/B: fully fuse the dense blocks' LN+MLP+residual "
                         "sublayer into one Pallas kernel (ops/ln_mlp.py)")
    ap.add_argument("--no_shared_prefix", action="store_true",
                    help="A/B: per-task passes recompute the task-"
                         "independent prefix (patch embed + block_0) "
                         "instead of sharing one prefix pass")
    ap.add_argument("--dump_hlo", default=None, metavar="PATH",
                    help="write the lowered StableHLO text to PATH (use "
                         "with --check_only to diff program changes)")
    ap.add_argument("--compile_stats", action="store_true",
                    help="compile (cache-warm) and print XLA memory "
                         "analysis, then exit — no device steps")
    ap.add_argument("--check_only", action="store_true",
                    help="warm-cache guard: trace+hash the default program "
                         "and exit 0 if sentinel-warm, 3 if a re-warm is "
                         "needed (prints the recipe); no compile, no step")
    ap.add_argument("--no_fallback", action="store_true",
                    help="disable the cold-compile scan_tasks fallback and "
                         "the watchdog (for deliberate cache-warming runs)")
    ap.add_argument("--budget_s", type=float,
                    default=float(os.environ.get("M3VIT_BENCH_BUDGET_S",
                                                 "1200")),
                    help="wall-clock budget to JSON (default 1200s or "
                         "$M3VIT_BENCH_BUDGET_S); the watchdog emits the "
                         "best-available measurement at the deadline")
    args = ap.parse_args()

    if not args.no_fallback:
        threading.Thread(target=_watchdog, args=(args.budget_s - 15.0,),
                         daemon=True).start()

    log(f"start: budget={args.budget_s:.0f}s devices={jax.devices()}")
    record = build_and_measure(args, scan_tasks_fallback=False,
                               budget_s=args.budget_s)
    if record is None:
        record = build_and_measure(args, scan_tasks_fallback=True,
                                   budget_s=args.budget_s)
    log("done")
    _emit(record)


if __name__ == "__main__":
    main()
