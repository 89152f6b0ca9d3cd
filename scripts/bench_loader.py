"""Host input-pipeline throughput bench (round-4 VERDICT item 1).

The reference feeds GPUs from a multi-process
``DataLoader(num_workers=p['nworkers'])`` (reference:
utils/common_config.py:673,715-746).  Our ``EpochLoader`` has two backends
(threads / fork-pool processes, data/loader.py); this script measures, on a
fabricated 512^2 PASCAL_MT tree with the REAL 5-task train transform chain:

  1. serial per-sample cost -> img/s per core,
  2. the GIL-held fraction of that per-sample work (a spinner thread's
     progress ratio while the loader runs vs idle) -> Amdahl ceiling for
     the thread backend,
  3. sustained EpochLoader img/s for each backend at several worker counts,
  4. the core count needed to sustain a v5e-8 flagship run (~260 img/s).

Prints one JSON line per measurement and a final summary JSON.  Pure
host-side: no jax/TPU involvement (safe to run next to a device job).

Usage: python scripts/bench_loader.py [--root /tmp/m3vit_loader_db]
         [--n 48] [--size 512] [--batch 8] [--workers 1,2,4,8]
         [--epochs 2] [--target 260]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fabricate(root: str, n: int, size: int) -> None:
    marker = os.path.join(root, f".loader_bench_{n}_{size}")
    if os.path.exists(marker):
        return
    print(f"[bench_loader] fabricating {n}x {size}^2 PASCAL tree at {root}",
          file=sys.stderr)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fabricate_dataset.py"),
         root, "--n", str(n), "--height", str(size), "--width", str(size)],
        check=True)
    open(marker, "w").close()


def build_dataset(root: str, seed: int = 0):
    """Flagship 5-task PASCAL train dataset with the real transform chain,
    wrapped with the CLI's deterministic per-sample augmentation rng."""
    import numpy as np

    from m3vit_tpu.config import create_config
    from m3vit_tpu.data.loader import get_dataset
    from m3vit_tpu.data.transforms import get_transformations

    env = {"root_dir": "/tmp/m3vit_loader_runs",
           "dataset_roots": {"PASCAL_MT": os.path.join(root, "PASCAL_MT")}}
    env_path = os.path.join(root, "env.yml")
    with open(env_path, "w") as f:
        import yaml

        yaml.safe_dump(env, f)
    p = create_config(env_path,
                      os.path.join(REPO, "configs", "pascal",
                                   "vit_moe_small_multi_task.yml"))
    tr, _ = get_transformations(p)
    ds = get_dataset(p, "train", None)

    class TDS:  # mirrors cli/train.py _TDS
        def __init__(self):
            self.ds, self.t, self.seed = ds, tr, seed

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            rng = np.random.RandomState((self.seed * 1_000_003 + i) % (2**31))
            return self.t(self.ds[i], rng)

    return TDS(), p


class GilSpinner(threading.Thread):
    """Counts GIL acquisitions per second; the slowdown of its rate while
    other work runs measures the fraction of time that work holds the GIL."""

    def __init__(self):
        super().__init__(daemon=True)
        self.count = 0
        self.stop_flag = False

    def run(self):
        while not self.stop_flag:
            self.count += 1

    def rate(self, seconds: float) -> float:
        self.count = 0
        t0 = time.perf_counter()
        time.sleep(seconds)
        return self.count / (time.perf_counter() - t0)


def measure_serial(tds, n_iter: int) -> float:
    n = len(tds)
    for i in range(min(4, n)):  # warm page cache + imports
        tds[i]
    t0 = time.perf_counter()
    for i in range(n_iter):
        tds[i % n]
    return (time.perf_counter() - t0) / n_iter


def measure_gil_fraction(tds, seconds: float = 6.0) -> float:
    sp = GilSpinner()
    sp.start()
    idle = sp.rate(1.5)

    done = threading.Event()

    def work():
        i = 0
        while not done.is_set():
            tds[i % len(tds)]
            i += 1

    w = threading.Thread(target=work, daemon=True)
    w.start()
    time.sleep(0.5)
    busy = sp.rate(seconds)
    done.set()
    w.join(timeout=30)
    sp.stop_flag = True
    # On a single-core host spinner and worker share the core; the spinner
    # only runs when the worker RELEASES the GIL, so busy/idle directly
    # estimates the released fraction (up to scheduler overhead).
    return max(0.0, 1.0 - busy / idle)


def measure_ipc_unit(tds, batch: int) -> dict:
    """Consumer-side cost of one batch for each IPC flavor: pickle-pipe
    (loads of an 84 MB flagship batch) vs shm (one memcpy out).  This is
    the single-thread cap on the consumer at scale — workers parallelize,
    the consumer does not."""
    import pickle

    from m3vit_tpu.data.loader import collate

    b = collate([tds[i % len(tds)] for i in range(batch)])
    arrays = {k: v for k, v in b.items() if k != "meta"}
    nbytes = sum(v.nbytes for v in arrays.values())
    blob = pickle.dumps(b, protocol=5)
    t0 = time.perf_counter()
    for _ in range(3):
        pickle.loads(blob)
    t_loads = (time.perf_counter() - t0) / 3
    import numpy as np

    t0 = time.perf_counter()
    for _ in range(3):
        for v in arrays.values():
            np.array(v)
    t_copy = (time.perf_counter() - t0) / 3
    return {
        "batch_mbytes": round(nbytes / 1e6, 1),
        "pickle_consumer_cap_imgs_per_sec": round(batch / t_loads, 0),
        "shm_consumer_cap_imgs_per_sec": round(batch / t_copy, 0),
    }


def measure_loader(tds, batch: int, workers: int, use_processes: bool,
                   epochs: int, use_shm: bool = True) -> float:
    from m3vit_tpu.data.loader import EpochLoader

    loader = EpochLoader(tds, batch_size=batch, shuffle=True, seed=0,
                         num_workers=workers, use_processes=use_processes,
                         use_shm=use_shm)
    # one warm epoch (pool spin-up, page cache), then timed epochs
    n_img = 0
    for b in loader.epoch(0):
        pass
    t0 = time.perf_counter()
    for e in range(1, 1 + epochs):
        for b in loader.epoch(e):
            n_img += b["image"].shape[0]
    dt = time.perf_counter() - t0
    return n_img / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/m3vit_loader_db")
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", default="1,2,4,8")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--target", type=float, default=260.0,
                    help="flagship v5e-8 ingest rate: 8 chips x ~32.4 img/s")
    ap.add_argument("--serial_iters", type=int, default=24)
    ap.add_argument("--skip_gil", action="store_true")
    args = ap.parse_args()

    ncpu = os.cpu_count() or 1
    fabricate(args.root, args.n, args.size)
    tds, _ = build_dataset(args.root)

    out = {"host_cpus": ncpu, "n_images": len(tds), "res": args.size,
           "batch": args.batch}

    per_sample = measure_serial(tds, args.serial_iters)
    out["serial_ms_per_image"] = round(per_sample * 1e3, 2)
    out["imgs_per_sec_per_core"] = round(1.0 / per_sample, 2)
    print(json.dumps({"measure": "serial", **out}), flush=True)

    if not args.skip_gil:
        gil_frac = measure_gil_fraction(tds)
        out["gil_held_fraction"] = round(gil_frac, 3)
        # Amdahl: N threads -> 1 / (gil + (1-gil)/N) speedup cap
        out["thread_scaling_ceiling"] = (
            round(1.0 / gil_frac, 1) if gil_frac > 1e-3 else float("inf"))
        print(json.dumps({"measure": "gil",
                          "gil_held_fraction": out["gil_held_fraction"],
                          "thread_scaling_ceiling":
                              out["thread_scaling_ceiling"]}), flush=True)

    ipc = measure_ipc_unit(tds, args.batch)
    out.update(ipc)
    print(json.dumps({"measure": "ipc_unit", **ipc}), flush=True)

    worker_counts = [int(w) for w in args.workers.split(",")]
    for kind, use_p, shm in (("threads", False, False),
                             ("processes_shm", True, True),
                             ("processes_pickle", True, False)):
        for w in worker_counts:
            rate = measure_loader(tds, args.batch, w, use_p, args.epochs,
                                  use_shm=shm)
            key = f"{kind}_{w}"
            out[key] = round(rate, 2)
            print(json.dumps({"measure": "loader", "backend": kind,
                              "workers": w, "imgs_per_sec": out[key]}),
                  flush=True)

    # extrapolation: processes scale ~linearly in cores (each worker is an
    # independent interpreter); threads cap at the Amdahl ceiling.
    per_core = out["imgs_per_sec_per_core"]
    out["cores_needed_for_target_processes"] = int(
        -(-args.target // max(per_core, 1e-9)))
    out["target_imgs_per_sec"] = args.target
    print(json.dumps({"measure": "summary", **out}), flush=True)


if __name__ == "__main__":
    main()
