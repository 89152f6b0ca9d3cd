"""Data pipeline tests on a fabricated mini PASCAL_MT tree."""

import json
import os

import numpy as np
import pytest
import scipy.io as sio
from PIL import Image

from m3vit_tpu.data.loader import EpochLoader, collate, get_dataset
from m3vit_tpu.data.pascal_context import PASCALContext, zhang_suen_thin
from m3vit_tpu.data.transforms import (
    AddIgnoreRegions,
    Compose,
    FixedResize,
    RandomHorizontalFlip,
    ScaleNRotate,
    ToArrays,
    get_transformations,
)

IDS = ["2008_000001", "2008_000002"]
H, W = 96, 128


def _make_parts_mat(path, inst_mask, part_mask):
    part_dt = np.dtype([("part_name", "O"), ("mask", "O")])
    parts_arr = np.zeros((1, 2), dtype=part_dt)
    parts_arr[0, 0] = (np.array(["head"]), part_mask.astype(np.uint8))
    parts_arr[0, 1] = (np.array(["torso"]), (inst_mask & ~part_mask).astype(np.uint8))
    obj_dt = np.dtype(
        [("class", "O"), ("class_ind", "O"), ("mask", "O"), ("parts", "O")]
    )
    objs = np.zeros((1, 1), dtype=obj_dt)
    objs[0, 0] = (
        np.array(["person"]),
        np.array([[15]]),
        inst_mask.astype(np.uint8),
        parts_arr,
    )
    anno_dt = np.dtype([("imname", "O"), ("objects", "O")])
    anno = np.zeros((1, 1), dtype=anno_dt)
    anno[0, 0] = (np.array(["img"]), objs)
    sio.savemat(path, {"anno": anno})


@pytest.fixture(scope="module")
def pascal_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("PASCAL_MT")
    rng = np.random.RandomState(0)
    os.makedirs(root / "JPEGImages")
    os.makedirs(root / "pascal-context" / "trainval")
    os.makedirs(root / "human_parts")
    os.makedirs(root / "semseg" / "pascal-context")
    os.makedirs(root / "normals_distill")
    os.makedirs(root / "sal_distill")
    os.makedirs(root / "ImageSets" / "Context")
    os.makedirs(root / "ImageSets" / "Parts")

    for i, im_id in enumerate(IDS):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        Image.fromarray(img).save(root / "JPEGImages" / f"{im_id}.jpg")
        # context LabelMap: two regions; class 3 is normals-valid, 5 is not
        label_map = np.full((H, W), 3, np.uint16)
        label_map[:, W // 2 :] = 5
        sio.savemat(
            root / "pascal-context" / "trainval" / f"{im_id}.mat",
            {"LabelMap": label_map},
        )
        inst = np.zeros((H, W), bool)
        inst[10:40, 10:60] = True
        part = np.zeros((H, W), bool)
        part[10:25, 10:60] = True
        _make_parts_mat(root / "human_parts" / f"{im_id}.mat", inst, part)
        sem = np.zeros((H, W), np.uint8)
        sem[:, : W // 2] = 15
        Image.fromarray(sem).save(
            root / "semseg" / "pascal-context" / f"{im_id}.png"
        )
        nrm = rng.randint(0, 255, (H, W, 3), np.uint8)
        Image.fromarray(nrm).save(root / "normals_distill" / f"{im_id}.png")
        sal = np.zeros((H, W), np.uint8)
        sal[20:60, 30:90] = 255
        Image.fromarray(sal).save(root / "sal_distill" / f"{im_id}.png")

    with open(root / "ImageSets" / "Context" / "train.txt", "w") as f:
        f.write("\n".join(IDS))
    with open(root / "ImageSets" / "Context" / "val.txt", "w") as f:
        f.write("\n".join(IDS))
    # first image has a person (cat 15), second doesn't
    with open(root / "ImageSets" / "Parts" / "train.txt", "w") as f:
        json.dump({IDS[0]: [15, 3], IDS[1]: [3]}, f)
    with open(root / "ImageSets" / "Parts" / "val.txt", "w") as f:
        json.dump({IDS[0]: [15, 3], IDS[1]: [3]}, f)
    return str(root)


def make_p(pascal_root):
    from m3vit_tpu.config import AttrDict
    from m3vit_tpu.tasks import parse_task_dictionary

    tasks, extra = parse_task_dictionary(
        "PASCALContext",
        {
            "include_semseg": True,
            "include_human_parts": True,
            "include_sal": True,
            "include_edge": True,
            "include_normals": True,
            "edge_w": 0.95,
        },
    )
    p = AttrDict(
        {
            "train_db_name": "PASCALContext",
            "val_db_name": "PASCALContext",
            "TASKS": tasks,
            "ALL_TASKS": tasks,
            "TASK_NAMES": [t.name for t in tasks],
            "train_scale": (64, 64),
            "test_scale": (64, 64),
            "db_paths": {"PASCAL_MT": pascal_root},
        }
    )
    p.update(extra)
    return p


def test_thinning_reduces_width():
    img = np.zeros((20, 20), bool)
    img[8:12, 2:18] = True  # 4-wide bar
    thin = zhang_suen_thin(img)
    assert thin.sum() < img.sum()
    assert thin.sum() > 0


def test_pascal_reader_label_semantics(pascal_root):
    ds = PASCALContext(
        pascal_root, split="train", do_edge=True, do_human_parts=True,
        do_semseg=True, do_normals=True, do_sal=True,
    )
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (H, W, 3)
    # edge: thin binary boundary between the two context regions
    assert set(np.unique(s["edge"])) <= {0.0, 1.0}
    assert s["edge"].sum() > 0
    # human parts: merged ids head=1, torso=2 (6-part map)
    assert set(np.unique(s["human_parts"])) == {0.0, 1.0, 2.0}
    # second image has no person -> all-zero parts
    s2 = ds[1]
    assert (s2["human_parts"] == 0).all()
    # normals: right half (class 5, not valid) zeroed
    assert np.abs(s["normals"][:, W // 2 :]).max() == 0.0
    assert np.abs(s["normals"][:, : W // 2]).max() > 0.0
    # sal binarized
    assert set(np.unique(s["sal"])) <= {0.0, 1.0}


def test_transform_stack(pascal_root):
    p = make_p(pascal_root)
    tr, ts = get_transformations(p)
    ds = PASCALContext(
        pascal_root, split="train", do_edge=True, do_human_parts=True,
        do_semseg=True, do_normals=True, do_sal=True,
    )
    rng = np.random.RandomState(3)
    s = tr(ds[0], rng)
    assert s["image"].shape == (64, 64, 3)
    assert s["image"].dtype == np.float32
    assert abs(float(s["image"].mean())) < 3.0  # normalized range
    assert s["normals"].shape == (64, 64, 3)
    # empty parts (image 2) -> 255 everywhere after AddIgnoreRegions
    s2 = tr(ds[1], np.random.RandomState(4))
    assert (s2["human_parts"] == 255).all()
    # zero-norm normals got ignore label 255
    assert (s2["normals"][:, 32:] == 255).any()

    # val stack keeps deterministic shapes
    sv = ts(ds[0], np.random.RandomState(5))
    assert sv["semseg"].shape == (64, 64, 1)


def test_loader_end_to_end(pascal_root):
    p = make_p(pascal_root)
    tr, _ = get_transformations(p)

    class _TDS:
        def __init__(self, ds, tr):
            self.ds, self.tr = ds, tr

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            return self.tr(self.ds[i], np.random.RandomState(i))

    ds = get_dataset(p, "train", None)
    loader = EpochLoader(_TDS(ds, tr), batch_size=2, seed=7, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 1
    b = batches[0]
    assert b["image"].shape == (2, 64, 64, 3)
    assert b["semseg"].shape == (2, 64, 64, 1)
    assert b["normals"].shape == (2, 64, 64, 3)
    assert len(b["meta"]) == 2
    # epoch seeding: different epochs may reorder, same epoch identical
    b0 = list(loader.epoch(1))[0]
    b1 = list(loader.epoch(1))[0]
    np.testing.assert_array_equal(
        np.asarray(b0["meta"][0]["image"]), np.asarray(b1["meta"][0]["image"])
    )


def test_process_loader_matches_thread_loader(pascal_root):
    """The fork-pool backend (both shm and pickle IPC) must yield bitwise
    the same batches in the same order as the thread backend."""
    p = make_p(pascal_root)
    tr, _ = get_transformations(p)

    class _TDS:
        def __init__(self, ds, tr):
            self.ds, self.tr = ds, tr

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            return self.tr(self.ds[i], np.random.RandomState(i))

    ds = get_dataset(p, "train", None)
    tds = _TDS(ds, tr)

    def run(use_processes, use_shm):
        loader = EpochLoader(tds, batch_size=2, seed=7, num_workers=2,
                             use_processes=use_processes, use_shm=use_shm)
        return list(loader.epoch(3))

    ref = run(False, False)
    for shm in (True, False):
        got = run(True, shm)
        assert len(got) == len(ref)
        for br, bg in zip(ref, got):
            assert set(br.keys()) == set(bg.keys())
            for k in br:
                if k == "meta":
                    assert [m["image"] for m in br[k]] == \
                        [m["image"] for m in bg[k]]
                else:
                    np.testing.assert_array_equal(br[k], bg[k])
                    assert br[k].dtype == bg[k].dtype


def test_process_loader_wedge_falls_back(pascal_root, monkeypatch):
    """A wedged pool worker (simulated: the fork-inherited fetch fn sleeps
    past $M3VIT_LOADER_TIMEOUT_S) must NOT hang the epoch: the pool is
    killed and the remaining batches are served in-process, identically."""
    import time as _time

    from m3vit_tpu.data import loader as loader_mod

    p = make_p(pascal_root)
    tr, _ = get_transformations(p)

    class _TDS:
        def __init__(self, ds, tr):
            self.ds, self.tr = ds, tr

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            return self.tr(self.ds[i], np.random.RandomState(i))

    ds = get_dataset(p, "train", None)
    tds = _TDS(ds, tr)
    ref = list(EpochLoader(tds, batch_size=2, seed=7, num_workers=2,
                           use_processes=False).epoch(1))

    monkeypatch.setenv("M3VIT_LOADER_TIMEOUT_S", "2")

    def wedged(indices):
        _time.sleep(600)

    monkeypatch.setattr(loader_mod, "_mp_fetch_collate", wedged)
    # pool forks AFTER the patch, so workers inherit the wedged fn
    loader = EpochLoader(tds, batch_size=2, seed=7, num_workers=2,
                         use_processes=True, use_shm=False)
    with pytest.warns(UserWarning, match="unresponsive"):
        got = list(loader.epoch(1))
    assert loader.use_processes is False  # sticky fallback
    assert len(got) == len(ref)
    for br, bg in zip(ref, got):
        for k in br:
            if k != "meta":
                np.testing.assert_array_equal(br[k], bg[k])


def test_grouped_loader_batches_within_aspect_group():
    from m3vit_tpu.data.loader import GroupedEpochLoader

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            # first 5 landscape (4x8), last 3 portrait (8x4)
            shape = (4, 8, 3) if i < 5 else (8, 4, 3)
            return {"image": np.full(shape, i, np.float32),
                    "meta": {"image": str(i), "im_size": shape[:2]}}

    flags = np.array([0] * 5 + [1] * 3)
    loader = GroupedEpochLoader(DS(), batch_size=2, group_flags=flags, seed=1)
    for batch in loader.epoch(0):
        ids = [int(m["image"]) for m in batch["meta"]]
        groups = {flags[i] for i in ids}
        assert len(groups) == 1  # never mixes aspect groups
