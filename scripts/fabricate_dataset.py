"""Fabricate tiny on-disk dataset trees (PASCAL_MT / NYUD_MT / cityscapes).

Purpose: drill the real-data playbook (scripts/run_when_mounted.sh --smoke)
end-to-end — env-config generation, dataset readers, transforms, train loop,
save-predictions, from-disk eval — before the day real datasets mount.
The layouts mirror the reference readers exactly:

  PASCAL_MT:  reference data/pascal_context.py:35-120 (JPEGImages/,
              pascal-context/trainval/*.mat LabelMap, human_parts/*.mat anno,
              semseg/pascal-context/*.png, normals_distill/, sal_distill/,
              ImageSets/{Context,Parts})
  NYUD_MT:    reference data/nyud.py (images/*.jpg, edge/*.npy,
              segmentation/*.png 1..40 with 0=void, normals/*.npy,
              depth/*.npy, gt_sets/{train,val}.txt)
  cityscapes: reference data/cityscapes.py:113-145 (<split>/image/<i>.npy
              NHWC float 0..1, label_7/<i>.npy with -1=ignore,
              depth/<i>.npy with 0=ignore)

Content is random but label-law-abiding (valid class ranges, ignore regions,
normals zeroed where invalid) so every loss/metric is finite and overfit-able.

Usage: python scripts/fabricate_dataset.py DB_ROOT [--n 8] [--height 96]
       [--width 128] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _save_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def _make_parts_mat(path, inst_mask, part_mask):
    """One 'person' (class_ind 15) with head/torso parts — the structure
    mat4py-loaded by the reference (data/pascal_context.py:150-200)."""
    import scipy.io as sio

    part_dt = np.dtype([("part_name", "O"), ("mask", "O")])
    parts_arr = np.zeros((1, 2), dtype=part_dt)
    parts_arr[0, 0] = (np.array(["head"]), part_mask.astype(np.uint8))
    parts_arr[0, 1] = (
        np.array(["torso"]), (inst_mask & ~part_mask).astype(np.uint8)
    )
    obj_dt = np.dtype(
        [("class", "O"), ("class_ind", "O"), ("mask", "O"), ("parts", "O")]
    )
    objs = np.zeros((1, 1), dtype=obj_dt)
    objs[0, 0] = (
        np.array(["person"]), np.array([[15]]), inst_mask.astype(np.uint8),
        parts_arr,
    )
    anno_dt = np.dtype([("imname", "O"), ("objects", "O")])
    anno = np.zeros((1, 1), dtype=anno_dt)
    anno[0, 0] = (np.array(["img"]), objs)
    sio.savemat(path, {"anno": anno})


def fabricate_pascal(root: str, n: int = 8, hw=(96, 128), seed: int = 0):
    import scipy.io as sio

    H, W = hw
    rng = np.random.RandomState(seed)
    ids = [f"2008_{i:06d}" for i in range(1, n + 1)]
    for sub in ("JPEGImages", "pascal-context/trainval", "human_parts",
                "semseg/pascal-context", "normals_distill", "sal_distill",
                "ImageSets/Context", "ImageSets/Parts"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    parts_index = {}
    for i, im_id in enumerate(ids):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        _save_png(os.path.join(root, "JPEGImages", f"{im_id}.jpg"), img)

        # context LabelMap: a normals-valid region (class 3) and an invalid
        # one (class 5), split at a per-image offset
        cut = W // 2 + (i % 3) * 8
        label_map = np.full((H, W), 3, np.uint16)
        label_map[:, cut:] = 5
        sio.savemat(
            os.path.join(root, "pascal-context", "trainval", f"{im_id}.mat"),
            {"LabelMap": label_map},
        )

        # every even image has a person instance with parts
        has_person = i % 2 == 0
        if has_person:
            inst = np.zeros((H, W), bool)
            inst[10:40, 10:60] = True
            part = np.zeros((H, W), bool)
            part[10:25, 10:60] = True
            _make_parts_mat(
                os.path.join(root, "human_parts", f"{im_id}.mat"), inst, part
            )
            parts_index[im_id] = [15, 3]
        else:
            parts_index[im_id] = [3]

        sem = np.zeros((H, W), np.uint8)
        sem[:, :cut] = 15 if has_person else 7
        _save_png(
            os.path.join(root, "semseg", "pascal-context", f"{im_id}.png"),
            sem,
        )
        nrm = rng.randint(0, 255, (H, W, 3), np.uint8)
        _save_png(os.path.join(root, "normals_distill", f"{im_id}.png"), nrm)
        sal = np.zeros((H, W), np.uint8)
        sal[20:60, 30:90] = 255
        _save_png(os.path.join(root, "sal_distill", f"{im_id}.png"), sal)

    for split in ("train", "val"):
        with open(os.path.join(root, "ImageSets", "Context",
                               f"{split}.txt"), "w") as f:
            f.write("\n".join(ids))
        with open(os.path.join(root, "ImageSets", "Parts",
                               f"{split}.txt"), "w") as f:
            json.dump(parts_index, f)
    return ids


def fabricate_nyud(root: str, n: int = 8, hw=(96, 128), seed: int = 1):
    H, W = hw
    rng = np.random.RandomState(seed)
    ids = [f"{i:04d}" for i in range(1, n + 1)]
    for sub in ("images", "edge", "segmentation", "normals", "depth",
                "gt_sets"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i, im_id in enumerate(ids):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        _save_png(os.path.join(root, "images", f"{im_id}.jpg"), img)
        edge = np.zeros((H, W), np.float32)
        edge[:, (W // 3 + i) % W] = 1.0
        np.save(os.path.join(root, "edge", f"{im_id}.npy"), edge)
        # 1..40 with 0=void (the reader shifts down and maps void to 255)
        sem = np.full((H, W), 1 + (i % 40), np.uint8)
        sem[:8, :8] = 0
        _save_png(os.path.join(root, "segmentation", f"{im_id}.png"), sem)
        nrm = rng.randn(H, W, 3).astype(np.float32)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-6)
        np.save(os.path.join(root, "normals", f"{im_id}.npy"), nrm)
        dep = rng.uniform(0.5, 10.0, (H, W)).astype(np.float32)
        np.save(os.path.join(root, "depth", f"{im_id}.npy"), dep)
    for split in ("train", "val"):
        with open(os.path.join(root, "gt_sets", f"{split}.txt"), "w") as f:
            f.write("\n".join(ids))
    return ids


def fabricate_cityscapes(root: str, n: int = 8, hw=(96, 128), seed: int = 2):
    H, W = hw
    rng = np.random.RandomState(seed)
    for split in ("train", "val"):
        for sub in ("image", "label_7", "depth"):
            os.makedirs(os.path.join(root, split, sub), exist_ok=True)
        for i in range(n):
            img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
            np.save(os.path.join(root, split, "image", f"{i}.npy"), img)
            sem = np.full((H, W), i % 7, np.float32)
            sem[:6, :6] = -1  # ignore
            np.save(os.path.join(root, split, "label_7", f"{i}.npy"), sem)
            dep = rng.uniform(0.1, 1.0, (H, W, 1)).astype(np.float32)
            dep[-6:, -6:] = 0  # ignore
            np.save(os.path.join(root, split, "depth", f"{i}.npy"), dep)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("db_root")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    hw = (args.height, args.width)
    fabricate_pascal(os.path.join(args.db_root, "PASCAL_MT"), args.n, hw,
                     args.seed)
    fabricate_nyud(os.path.join(args.db_root, "NYUD_MT"), args.n, hw,
                   args.seed + 1)
    fabricate_cityscapes(os.path.join(args.db_root, "cityscapes"), args.n,
                         hw, args.seed + 2)
    print(f"fabricated PASCAL_MT/NYUD_MT/cityscapes under {args.db_root} "
          f"(n={args.n}, {hw[0]}x{hw[1]})")


if __name__ == "__main__":
    main()
