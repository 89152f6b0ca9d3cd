"""Host-side data loading: dataset factory, epoch-seeded shuffling, threaded
map, dict collate, and device prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(reference: utils/sampler.py:74-97 — epoch-seeded shuffle with padding to
divisibility; utils/custom_collate.py:32-82 — dict-recursive stacking).
On TPU there is one process per host: the global batch is assembled here and
sharded over the mesh by jax.device_put, so no per-rank sampling is needed.
"""

from __future__ import annotations

import collections
import itertools
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


def get_dataset(p, split: str, transform, overfit: bool = False):
    """reference: utils/common_config.py:635-716 (get_train/val_dataset)."""
    db = p["train_db_name"] if split == "train" else p["val_db_name"]
    names = set(p["TASK_NAMES"])
    roots = p.get("db_paths", {})
    if db == "PASCALContext":
        from m3vit_tpu.data.pascal_context import PASCALContext

        return PASCALContext(
            root=roots.get("PASCAL_MT", ""),
            split="train" if split == "train" else "val",
            transform=transform,
            overfit=overfit,
            do_edge="edge" in names,
            do_human_parts="human_parts" in names,
            do_semseg="semseg" in names,
            do_normals="normals" in names,
            do_sal="sal" in names,
        )
    if db == "NYUD":
        from m3vit_tpu.data.nyud import NYUD

        return NYUD(
            root=roots.get("NYUD_MT", ""),
            split="train" if split == "train" else "val",
            transform=transform,
            overfit=overfit,
            do_edge="edge" in names,
            do_semseg="semseg" in names,
            do_normals="normals" in names,
            do_depth="depth" in names,
        )
    if db == "CityScapes":
        from m3vit_tpu.data.cityscapes import CityScapes

        return CityScapes(
            root=roots.get("cityscapes", ""),
            split="train" if split == "train" else "val",
            transform=transform,
            overfit=overfit,
            do_semseg="semseg" in names,
            do_depth="depth" in names,
        )
    raise NotImplementedError(db)


def collate(samples) -> Dict:
    """Dict-recursive stack (reference collate_mil, custom_collate.py:32-82).
    meta stays a list."""
    out: Dict = {}
    for key in samples[0]:
        if key == "meta":
            out["meta"] = [s["meta"] for s in samples]
        else:
            out[key] = np.stack([s[key] for s in samples]).astype(np.float32)
    return out


# --- process-pool worker state (fork-inherited; see EpochLoader) ---------
_MP_DATASET = None


def _mp_init(dataset):
    global _MP_DATASET
    _MP_DATASET = dataset


def _mp_fetch_collate(indices):
    return collate([_MP_DATASET[int(i)] for i in indices])


def _mp_worker_loop(dataset, use_shm, inq, outq):
    """Body of one bare loader worker process.

    Deliberately NOT multiprocessing.Pool: Pool's handler threads hang in
    terminate() when a worker dies or is killed while holding a queue lock
    (observed as a full-suite pytest hang), so — like torch's DataLoader —
    the loader uses plain daemon Processes + Queues, which a parent can
    SIGKILL at any moment with nothing left to join."""
    _mp_init(dataset)
    # resolve at call time so a test-patched module function is honored
    fetch = _mp_fetch_collate_shm if use_shm else _mp_fetch_collate
    while True:
        task = inq.get()
        if task is None:
            return
        tid, idx = task
        try:
            outq.put((tid, fetch(idx), None))
        except Exception as e:  # noqa: BLE001 - surfaced to the parent
            try:
                outq.put((tid, None, f"{type(e).__name__}: {e}"))
            except Exception:
                return


def _mp_fetch_collate_shm(indices):
    """Collate in the worker, hand the arrays back through POSIX shared
    memory instead of the pool's pickle pipe.  An 84 MB flagship batch costs
    the consumer ~33 ms of pipe-read+unpickle (caps one consumer thread at
    ~240 img/s, under the ~260 img/s a v5e-8 flagship run ingests); the shm
    path is one worker-side memcpy in + one consumer-side memcpy out
    (~13 ms, measured in scripts/bench_loader.py)."""
    from multiprocessing import shared_memory

    batch = collate([_MP_DATASET[int(i)] for i in indices])
    arrays = {k: v for k, v in batch.items() if k != "meta"}
    total = sum(v.nbytes for v in arrays.values())
    shm = shared_memory.SharedMemory(create=True, size=max(total, 1))
    layout = []
    off = 0
    for k, v in arrays.items():
        np.ndarray(v.shape, v.dtype, buffer=shm.buf, offset=off)[...] = v
        layout.append((k, v.shape, str(v.dtype), off))
        off += v.nbytes
    # the consumer owns the segment's lifetime (it unlinks after copying
    # out); stop this process's resource_tracker from double-unlinking it
    try:
        from multiprocessing import resource_tracker

        resource_tracker.unregister(shm._name, "shared_memory")
    except Exception:
        pass
    shm.close()
    return ("__shm__", shm.name, layout, batch.get("meta"))


def _shm_to_batch(msg) -> Dict:
    """Copy a worker's shm batch out and release the segment."""
    from multiprocessing import shared_memory

    _, name, layout, meta = msg
    shm = shared_memory.SharedMemory(name=name)
    try:
        out: Dict = {
            k: np.array(np.ndarray(shape, dtype, buffer=shm.buf, offset=off))
            for k, shape, dtype, off in layout
        }
    finally:
        shm.close()
        shm.unlink()
    if meta is not None:
        out["meta"] = meta
    return out


class EpochLoader:
    """Epoch-seeded shuffling loader for the cv2-heavy transform work.

    Two parallel backends:
      * ``use_processes=False`` — thread pool + background prefetch queue.
        cv2/PIL release the GIL for the big ops but the numpy label
        encode/collate path does not, capping thread scaling (measured
        ~40% GIL-held on the PASCAL 512^2 train chain; scripts/bench_loader.py).
      * ``use_processes=True`` — bare fork-spawned daemon worker
        processes + queues (NOT multiprocessing.Pool — see
        _mp_worker_loop); each worker builds and collates one WHOLE batch
        (batch-level tasks amortize IPC) with a bounded in-flight window
        of ``num_workers + prefetch`` batches, and every wait is bounded
        with an in-process fallback (never hangs).  This is the TPU
        equivalent of the reference's multi-process
        ``DataLoader(num_workers=...)``
        (reference: utils/common_config.py:673,715).  Requires a
        fork-capable platform; falls back to threads otherwise.

    Batch order and per-sample augmentation rng are identical across
    backends (ordering is deterministic in (seed, epoch); the CLI's
    dataset wrapper derives the augmentation rng from the sample index).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        use_processes: bool = False,
        use_shm: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        if use_processes:
            import multiprocessing

            if "fork" not in multiprocessing.get_all_start_methods():
                use_processes = False
        self.use_processes = use_processes
        self.use_shm = use_shm
        # persistent bare-process workers, created at CONSTRUCTION time:
        # the earlier the fork, the fewer parent threads/locks a worker
        # can inherit in a wedged state (the CLI builds loaders before any
        # jit compiles), and epochs reuse the warm workers (torch
        # persistent_workers).  See _mp_worker_loop for why this is NOT a
        # multiprocessing.Pool.
        self._procs = []
        self._inq = None
        self._outq = None
        if self.use_processes:
            ctx = multiprocessing.get_context("fork")
            self._inq = ctx.Queue()
            self._outq = ctx.Queue()
            # NOTE: fork passes the dataset by memory (Process args are
            # not pickled under fork), so closure-defined dataset wrappers
            # (cli/train.py _TDS) work.  Workers never touch jax.
            self._procs = [
                ctx.Process(target=_mp_worker_loop,
                            args=(self.dataset, use_shm, self._inq,
                                  self._outq),
                            daemon=True)
                for _ in range(self.num_workers)
            ]
            for p in self._procs:
                p.start()

    def _kill_pool(self):
        """SIGKILL teardown — bare processes + cancel_join_thread'd queues
        leave nothing that can hang."""
        procs, self._procs = self._procs, []
        inq, self._inq = self._inq, None
        outq, self._outq = self._outq, None
        for p in procs:
            try:
                p.kill()
            except Exception:
                pass
        for p in procs:
            try:
                p.join(timeout=1.0)
            except Exception:
                pass
        for q in (inq, outq):
            if q is not None:
                try:
                    q.cancel_join_thread()
                    q.close()
                except Exception:
                    pass

    def close(self):
        self._kill_pool()

    def __del__(self):  # best-effort; workers are daemonic anyway
        try:
            self._kill_pool()
        except Exception:
            pass

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        return order

    def _epoch_processes(self, epoch: int) -> Iterator[Dict]:
        """Worker-process epoch: batch-granular tasks, bounded in-flight
        window, deterministic batch order (results re-ordered by task id).

        Deadlock guard: forking a thread-heavy parent (a long jax session)
        can wedge a child on a fork-inherited lock, and a wedged worker's
        task never completes (observed: the full pytest suite hung inside
        multiprocessing.Pool).  Every result wait is bounded
        ($M3VIT_LOADER_TIMEOUT_S, default 300 s; 0 disables), worker
        liveness is polled so a DEAD worker fails fast, and on
        expiry/death the workers are SIGKILLed (nothing joinable remains —
        see _mp_worker_loop) and the epoch FALLS BACK to in-process
        loading with a loud warning — identical batches, degraded
        throughput, never a hang."""
        import os
        import queue as queue_mod
        import time
        import warnings

        timeout = float(os.environ.get("M3VIT_LOADER_TIMEOUT_S", "300"))
        n = len(self.dataset)
        order = self._epoch_order(epoch)
        nb = len(self)
        idx_lists = [
            [int(j) for j in order[b * self.batch_size:
                                   min((b + 1) * self.batch_size, n)]]
            for b in range(nb)
        ]

        done: Dict[int, object] = {}
        submitted = 0
        window = self.num_workers + self.prefetch
        # epoch serial tag: an abandoned epoch's stale in-flight results
        # must not be mistaken for this epoch's batches
        self._epoch_serial = getattr(self, "_epoch_serial", 0) + 1
        ser = self._epoch_serial

        def release(val):
            # free a completed-but-unconsumed shm batch
            if self.use_shm and isinstance(val, tuple) and val \
                    and val[0] == "__shm__":
                try:
                    from multiprocessing import shared_memory

                    s = shared_memory.SharedMemory(name=val[1])
                    s.close()
                    s.unlink()
                except Exception:
                    pass

        def fallback(from_tid):
            warnings.warn(
                f"loader workers unresponsive for {timeout:.0f}s "
                "(fork-inherited lock wedge or worker death) — killing "
                "them and loading in-process from here on (identical "
                "batches, slower); restart the run to retry a fresh pool",
                stacklevel=3)
            for v in done.values():
                release(v)
            self._kill_pool()
            self.use_processes = False  # sticky: later epochs use threads
            for tid in range(from_tid, nb):
                yield collate([self.dataset[int(i)]
                               for i in idx_lists[tid]])

        for _ in range(min(window, nb)):
            self._inq.put(((ser, submitted), idx_lists[submitted]))
            submitted += 1
        for want in range(nb):
            deadline = time.monotonic() + (timeout if timeout > 0 else 1e12)
            while want not in done:
                # a dead worker never reports: bound the wait and also
                # poll liveness so worker death fails fast, not at timeout
                try:
                    tid, val, err = self._outq.get(
                        timeout=min(5.0, max(0.1,
                                             deadline - time.monotonic())))
                except queue_mod.Empty:
                    alive = any(p.is_alive() for p in self._procs)
                    if time.monotonic() >= deadline or not alive:
                        yield from fallback(want)
                        return
                    continue
                if err is not None:
                    self._kill_pool()
                    raise RuntimeError(f"loader worker failed: {err}")
                if tid[0] != ser:  # stale result from an abandoned epoch
                    release(val)
                    continue
                done[tid[1]] = val
            batch = done.pop(want)
            if self.use_shm:
                batch = _shm_to_batch(batch)
            if submitted < nb:
                self._inq.put(((ser, submitted), idx_lists[submitted]))
                submitted += 1
            yield batch

    def epoch(self, epoch: int) -> Iterator[Dict]:
        if self.use_processes and self._procs:
            yield from self._epoch_processes(epoch)
            return
        n = len(self.dataset)
        order = self._epoch_order(epoch)
        nb = len(self)

        def fetch(i):
            # per-sample augmentation rng: deterministic in (seed, epoch, idx)
            item = self.dataset[int(order[i])]
            return item

        with ThreadPoolExecutor(self.num_workers) as pool:
            q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
            stop = threading.Event()

            def put(item):
                # bounded put that aborts when the consumer abandoned the
                # generator (otherwise the thread pins batches forever)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        return True
                    except queue.Full:
                        continue
                return False

            def producer():
                try:
                    for b in range(nb):
                        lo = b * self.batch_size
                        hi = min(lo + self.batch_size, n)
                        samples = list(pool.map(fetch, range(lo, hi)))
                        if not put(collate(samples)):
                            return
                finally:
                    put(None)

            t = threading.Thread(target=producer, daemon=True)
            t.start()
            try:
                while True:
                    batch = q.get()
                    if batch is None:
                        break
                    yield batch
            finally:
                stop.set()


def pad_batch(batch: Dict, to_size: int) -> Dict:
    """Pad a batch to `to_size` rows by repeating the last sample.  'meta'
    keeps only the real entries, so evaluation ignores the padding."""
    n = next(v.shape[0] for k, v in batch.items() if k != "meta")
    if n >= to_size:
        return batch
    reps = to_size - n
    out = {}
    for k, v in batch.items():
        if k == "meta":
            out[k] = v
        else:
            pad = np.repeat(v[-1:], reps, axis=0)
            out[k] = np.concatenate([v, pad], axis=0)
    return out


def device_put_batches(batches: Iterator[Dict], sharding=None) -> Iterator[Dict]:
    """Move host batches onto the mesh with one-step lookahead so the host
    stays ahead of the device (double-buffered HBM input)."""
    import jax

    def put(b):
        return {
            k: (jax.device_put(v, sharding) if sharding is not None
                else jax.device_put(v))
            for k, v in b.items()
            if k != "meta"
        } | ({"meta": b["meta"]} if "meta" in b else {})

    prev = None
    for b in batches:
        cur = put(b)
        if prev is not None:
            yield prev
        prev = cur
    if prev is not None:
        yield prev


def aspect_ratio_groups(dataset, im_sizes=None) -> np.ndarray:
    """Group flag per sample: 0 = landscape (w/h >= 1), 1 = portrait
    (reference GroupSampler/DistributedGroupSampler, utils/sampler.py:100-223:
    batches drawn within one aspect group)."""
    flags = []
    for i in range(len(dataset)):
        if im_sizes is not None:
            h, w = im_sizes[i]
        else:
            s = dataset[i]
            meta = s.get("meta", {})
            h, w = meta.get("im_size", s["image"].shape[:2])
        flags.append(0 if w >= h else 1)
    return np.asarray(flags, np.int32)


class GroupedEpochLoader(EpochLoader):
    """EpochLoader drawing each batch from one aspect-ratio group."""

    def __init__(self, dataset, batch_size: int, group_flags: np.ndarray,
                 **kw):
        # this loader's epoch() is serial — never spin up a worker pool
        kw["use_processes"] = False
        super().__init__(dataset, batch_size, **kw)
        self.group_flags = np.asarray(group_flags)

    def epoch(self, epoch: int):
        rng = np.random.RandomState(self.seed + epoch)
        order = []
        for g in np.unique(self.group_flags):
            idx = np.where(self.group_flags == g)[0]
            if self.shuffle:
                rng.shuffle(idx)
            # pad group to batch divisibility by wrapping (reference
            # GroupSampler padding, sampler.py:123-135)
            pad = (-len(idx)) % self.batch_size
            if pad and len(idx):
                idx = np.concatenate([idx, idx[:pad]])
            order.extend(idx.reshape(-1, self.batch_size))
        if self.shuffle:
            rng.shuffle(order)
        for batch_idx in order:
            samples = [self.dataset[int(i)] for i in batch_idx]
            yield collate(samples)
