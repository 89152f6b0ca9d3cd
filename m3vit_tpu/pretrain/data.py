"""ImageNet ImageFolder reader with DeiT-style train augmentation.

reference: pretrain/datasets/imagenet.py (ImageFolder + transforms).  Uses
PIL + numpy; RandomResizedCrop / horizontal flip / ImageNet normalization.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Tuple

import numpy as np
from PIL import Image

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)
EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ImageFolder:
    def __init__(self, root: str, img_size: int = 224, train: bool = True):
        if not os.path.isdir(root):
            raise FileNotFoundError(root)
        self.root = root
        self.img_size = img_size
        self.train = train
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for f in sorted(os.listdir(cdir)):
                if f.lower().endswith(EXTS):
                    self.samples.append((os.path.join(cdir, f),
                                         self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def load(self, i: int, rng: np.random.RandomState) -> Tuple[np.ndarray, int]:
        path, label = self.samples[i]
        img = Image.open(path).convert("RGB")
        s = self.img_size
        if self.train:
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


def iterate_epoch(
    ds: ImageFolder, batch_size: int, epoch: int, seed: int = 0
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    rng = np.random.RandomState(seed + epoch)
    order = rng.permutation(len(ds))
    nb = len(ds) // batch_size
    for b in range(nb):
        idx = order[b * batch_size:(b + 1) * batch_size]
        ims, labs = zip(*(ds.load(int(i), rng) for i in idx))
        yield np.stack(ims), np.asarray(labs)
