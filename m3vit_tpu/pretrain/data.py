"""ImageNet ImageFolder reader with DeiT-style train augmentation.

reference: pretrain/datasets/imagenet.py (ImageFolder + transforms, class-dir
label inference, folder-index cache) and pretrain/datasets/samplers.py
(RASampler repeated augmentation).  Uses PIL + numpy; RandomResizedCrop /
horizontal flip / ImageNet normalization.  The reference's HuggingFace
auto-materialization path (imagenet.py:44-291) is a network feature —
justified omission in this zero-egress environment; the on-disk ImageFolder
layout it materializes INTO is fully supported, including the
"{label}_{name}" numeric-prefix class-dir scheme it writes
(imagenet.py:138-176).
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)
EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")

INDEX_CACHE = "m3vit_imagefolder_index.json"


def infer_class_mapping(class_dirs: List[str]) -> Dict[str, int]:
    """Class-dir name -> label.

    When EVERY dir matches the "{int}_{name}" scheme the HF materializer
    writes (reference imagenet.py:138-176), the numeric prefix IS the label;
    otherwise labels are alphabetical order (torchvision ImageFolder rule).
    """
    parsed = {}
    for d in class_dirs:
        head = d.split("_", 1)[0]
        if not head.isdigit():
            parsed = None
            break
        parsed[d] = int(head)
    if parsed and len(set(parsed.values())) == len(parsed):
        return parsed
    return {c: i for i, c in enumerate(sorted(class_dirs))}


def _scan_folder(root: str) -> Tuple[List[Tuple[str, int]], Dict[str, int]]:
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    class_to_idx = infer_class_mapping(classes)
    samples: List[Tuple[str, int]] = []
    for c in classes:
        cdir = os.path.join(root, c)
        for f in sorted(os.listdir(cdir)):
            if f.lower().endswith(EXTS):
                samples.append((os.path.join(cdir, f), class_to_idx[c]))
    return samples, class_to_idx


class ImageFolder:
    """ImageFolder with an on-disk index cache (reference imagenet.py:
    328-430 caches the 1.3M-file folder scan; re-validated against the
    current class-dir listing)."""

    def __init__(self, root: str, img_size: int = 224, train: bool = True,
                 use_index_cache: bool = True):
        if not os.path.isdir(root):
            raise FileNotFoundError(root)
        self.root = root
        self.img_size = img_size
        self.train = train
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        cache_path = os.path.join(root, INDEX_CACHE)
        cached = None
        if use_index_cache and os.path.isfile(cache_path):
            try:
                with open(cache_path) as f:
                    cached = json.load(f)
                if cached.get("classes") != classes:
                    cached = None  # stale: class dirs changed
            except (json.JSONDecodeError, OSError):
                cached = None
        if cached is not None:
            self.class_to_idx = dict(cached["class_to_idx"])
            self.samples = [(os.path.join(root, p), int(l))
                            for p, l in cached["samples"]]
        else:
            self.samples, self.class_to_idx = _scan_folder(root)
            if use_index_cache:
                try:
                    with open(cache_path, "w") as f:
                        json.dump({
                            "classes": classes,
                            "class_to_idx": self.class_to_idx,
                            "samples": [
                                (os.path.relpath(p, root), l)
                                for p, l in self.samples
                            ],
                        }, f)
                except OSError:
                    pass  # read-only dataset mount: scan each time

    def __len__(self):
        return len(self.samples)

    def load(self, i: int, rng: np.random.RandomState,
             train: Optional[bool] = None) -> Tuple[np.ndarray, int]:
        path, label = self.samples[i]
        img = Image.open(path).convert("RGB")
        s = self.img_size
        if self.train if train is None else train:
            # RandomResizedCrop(scale 0.08-1.0, ratio 3/4-4/3)
            w, h = img.size
            area = w * h
            for _ in range(10):
                target = rng.uniform(0.08, 1.0) * area
                ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
                cw = int(round(np.sqrt(target * ar)))
                ch = int(round(np.sqrt(target / ar)))
                if cw <= w and ch <= h:
                    x0 = rng.randint(0, w - cw + 1)
                    y0 = rng.randint(0, h - ch + 1)
                    img = img.crop((x0, y0, x0 + cw, y0 + ch))
                    break
            img = img.resize((s, s), Image.BICUBIC)
            if rng.rand() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
        else:
            # resize shorter side to s/0.875 then center crop
            w, h = img.size
            short = int(s / 0.875)
            if w < h:
                img = img.resize((short, int(h * short / w)), Image.BICUBIC)
            else:
                img = img.resize((int(w * short / h), short), Image.BICUBIC)
            w, h = img.size
            x0, y0 = (w - s) // 2, (h - s) // 2
            img = img.crop((x0, y0, x0 + s, y0 + s))
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - MEAN) / STD, label


def repeated_aug_order(
    n: int, epoch: int, num_repeats: int = 3, seed: int = 0,
    round_to: int = 256,
) -> np.ndarray:
    """DeiT repeated-augmentation epoch order (reference RASampler,
    pretrain/datasets/samplers.py:9-72, single-replica form).

    Shuffle with the epoch seed, repeat each index `num_repeats` times
    CONSECUTIVELY (same image, independent augmentations land in the same
    epoch), pad/truncate to ceil(n*r) and select the first
    floor(n/round_to)*round_to samples — the reference's
    num_selected_samples with world_size 1.
    """
    rng = np.random.RandomState(seed + epoch)
    indices = rng.permutation(n)
    indices = np.repeat(indices, num_repeats)
    total = int(math.ceil(n * num_repeats))
    if len(indices) < total:
        indices = np.concatenate([indices, indices[: total - len(indices)]])
    selected = int(math.floor(n / round_to) * round_to)
    if selected == 0:
        selected = n  # tiny (fabricated/test) datasets: keep one epoch's worth
    return indices[:selected]


def split_train_val(
    ds: ImageFolder, val_fraction: float = 0.04, seed: int = 0
) -> Tuple[List[int], List[int]]:
    """Deterministic per-class holdout when no val/ directory exists.

    Same (train, val) index partition every run for a given folder + seed:
    per class, a seeded permutation holds out ceil(fraction * class_size)
    samples (at least 1).  Extension over the reference, which requires a
    materialized val split on disk (imagenet.py:120-131).
    """
    by_class: Dict[int, List[int]] = {}
    for i, (_, label) in enumerate(ds.samples):
        by_class.setdefault(label, []).append(i)
    train_idx: List[int] = []
    val_idx: List[int] = []
    for label in sorted(by_class):
        idx = np.asarray(by_class[label])
        order = np.random.RandomState(seed + label).permutation(len(idx))
        k = max(1, int(math.ceil(val_fraction * len(idx))))
        val_idx.extend(idx[order[:k]].tolist())
        train_idx.extend(idx[order[k:]].tolist())
    return sorted(train_idx), sorted(val_idx)


# --- fork-pool worker state for iterate_epoch(num_workers>0) -------------
_PT_DS = None


def _pt_init(ds):
    global _PT_DS
    _PT_DS = ds


def _pt_load_batch(task):
    seed, epoch, idx = task
    ims, labs = zip(*(
        _PT_DS.load(int(i),
                    np.random.RandomState(
                        (seed * 1_000_003 + epoch * 997 + int(i)) % (2**31)))
        for i in idx))
    return np.stack(ims), np.asarray(labs)


def _pt_worker_loop(ds, inq, outq):
    """Bare daemon worker (NOT multiprocessing.Pool — Pool's handler
    threads hang in terminate() when a worker dies/is killed holding a
    queue lock; same design as data/loader.py _mp_worker_loop)."""
    _pt_init(ds)
    while True:
        task = inq.get()
        if task is None:
            return
        tid, payload = task
        try:
            outq.put((tid, _pt_load_batch(payload), None))
        except Exception as e:  # noqa: BLE001 - surfaced to the parent
            try:
                outq.put((tid, None, f"{type(e).__name__}: {e}"))
            except Exception:
                return


def _pt_pooled_batches(ds, tasks, num_workers):
    """Run the batch tasks through bare fork workers with bounded waits
    and an in-process fallback (identical batches — per-sample rng)."""
    import multiprocessing
    import queue as queue_mod
    import time
    import warnings

    timeout = float(os.environ.get("M3VIT_LOADER_TIMEOUT_S", "300"))
    ctx = multiprocessing.get_context("fork")
    inq, outq = ctx.Queue(), ctx.Queue()
    procs = [ctx.Process(target=_pt_worker_loop, args=(ds, inq, outq),
                         daemon=True) for _ in range(num_workers)]
    for p in procs:
        p.start()

    def kill():
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
            try:
                q.cancel_join_thread()
                q.close()
            except Exception:
                pass

    nb = len(tasks)
    done = {}
    submitted = 0
    killed = False
    try:
        for _ in range(min(num_workers + 2, nb)):
            inq.put((submitted, tasks[submitted]))
            submitted += 1
        for want in range(nb):
            deadline = time.monotonic() + (timeout if timeout > 0 else 1e12)
            while want not in done:
                try:
                    tid, val, err = outq.get(
                        timeout=min(5.0, max(0.1,
                                             deadline - time.monotonic())))
                except queue_mod.Empty:
                    alive = any(p.is_alive() for p in procs)
                    if time.monotonic() >= deadline or not alive:
                        warnings.warn(
                            f"pretrain loader workers unresponsive for "
                            f"{timeout:.0f}s — killing them and loading "
                            "in-process (identical batches, slower)",
                            stacklevel=2)
                        kill()
                        killed = True
                        _pt_init(ds)
                        for tid2 in range(want, nb):
                            yield _pt_load_batch(tasks[tid2])
                        return
                    continue
                if err is not None:
                    kill()
                    killed = True
                    raise RuntimeError(f"pretrain loader worker failed: "
                                       f"{err}")
                done[tid] = val
            batch = done.pop(want)
            if submitted < nb:
                inq.put((submitted, tasks[submitted]))
                submitted += 1
            yield batch
    finally:
        if not killed:
            kill()


def iterate_epoch(
    ds: ImageFolder, batch_size: int, epoch: int, seed: int = 0,
    repeated_aug: bool = False, num_repeats: int = 3,
    subset: Optional[List[int]] = None, num_workers: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Epoch iterator.  ``num_workers > 0`` loads batches in a fork pool
    (the reference DeiT trainer's multi-process DataLoader equivalent,
    same rationale as data/loader.py EpochLoader).  Per-sample
    augmentation rng is derived from (seed, epoch, sample index) on EVERY
    path — serial included — so worker count never changes the data
    (deterministic, like the MTL loader's _TDS wrapper)."""
    rng = np.random.RandomState(seed + epoch)
    n = len(subset) if subset is not None else len(ds)
    if repeated_aug:
        order = repeated_aug_order(n, epoch, num_repeats, seed)
    else:
        order = rng.permutation(n)
    if subset is not None:
        order = np.asarray(subset)[order]
    nb = len(order) // batch_size
    if num_workers > 0:
        import multiprocessing

        if "fork" in multiprocessing.get_all_start_methods():
            tasks = [(seed, epoch,
                      [int(i) for i in
                       order[b * batch_size:(b + 1) * batch_size]])
                     for b in range(nb)]
            yield from _pt_pooled_batches(ds, tasks, num_workers)
            return
    # serial path: same per-sample rng derivation as the pool workers, so
    # the data is identical for EVERY num_workers value (0 included)
    _pt_init(ds)
    for b in range(nb):
        idx = [int(i) for i in order[b * batch_size:(b + 1) * batch_size]]
        yield _pt_load_batch((seed, epoch, idx))


def iterate_eval(
    ds: ImageFolder, batch_size: int, subset: Optional[List[int]] = None
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic full-coverage eval pass (center-crop path; the last
    partial batch is dropped to keep shapes static)."""
    rng = np.random.RandomState(0)  # unused by the eval transform
    order = np.asarray(subset) if subset is not None else np.arange(len(ds))
    nb = len(order) // batch_size
    for b in range(nb):
        idx = order[b * batch_size:(b + 1) * batch_size]
        ims, labs = zip(*(ds.load(int(i), rng, train=False) for i in idx))
        yield np.stack(ims), np.asarray(labs)
