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


class EpochLoader:
    """Epoch-seeded shuffling loader with a thread pool for the cv2-heavy
    transform work and a background prefetch queue."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
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
