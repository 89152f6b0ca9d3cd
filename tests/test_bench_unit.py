"""Unit tests for bench.py's time-to-JSON machinery (round-3 VERDICT #1).

The benchmark must emit its JSON line under any cache state; these tests
exercise the host-side pieces — sentinel hash lists, the pickled shape
tree, watchdog emission, and the record shape — without touching a TPU.
"""

import importlib.util
import json
import os
import pickle
import sys

import numpy as np
import pytest


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod  # _SD must be pickleable by module path
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "SENTINEL", str(tmp_path / "sentinel.json"))
    return mod


def test_sentinel_hash_list_roundtrip(bench):
    assert bench._sentinel_hashes("m") == []
    bench._write_sentinel("m", "aaa")
    bench._write_sentinel("m", "bbb")
    bench._write_sentinel("m", "aaa")  # dedup
    assert bench._sentinel_hashes("m") == ["aaa", "bbb"]
    assert bench._sentinel_hashes("other") == []


def test_sentinel_accepts_legacy_string_format(bench):
    # pre-r4 sentinels stored a single hash string per metric
    with open(bench.SENTINEL, "w") as f:
        json.dump({"m": "old"}, f)
    assert bench._sentinel_hashes("m") == ["old"]
    bench._write_sentinel("m", "new")
    assert bench._sentinel_hashes("m") == ["old", "new"]


def test_sentinel_corrupt_file_is_cold_not_crash(bench):
    with open(bench.SENTINEL, "w") as f:
        f.write("{not json")
    assert bench._read_sentinel() == {}
    bench._write_sentinel("m", "h")  # recovers
    assert bench._sentinel_hashes("m") == ["h"]


def test_shape_tree_pickle_roundtrip(bench, tmp_path):
    import jax.numpy as jnp

    tree = {"params": {"w": jnp.zeros((3, 4), jnp.bfloat16)},
            "batch_stats": {"bn": {"mean": jnp.ones((4,), jnp.float32)}}}

    class S:  # minimal TrainState stand-in
        params = tree["params"]
        batch_stats = tree["batch_stats"]

    path = str(tmp_path / "shapes.pkl")
    bench._save_shapes(S, path)
    with open(path, "rb") as f:
        saved = pickle.load(f)
    # persisted as module-independent plain tuples
    raw = saved["params"]["w"]
    assert raw[0] == "__sd__"
    sd = bench._sd_from_obj(raw)
    assert sd.shape == (3, 4) and sd.dtype == "bfloat16"
    z = jnp.zeros(sd.shape, sd.dtype)
    assert z.shape == (3, 4) and str(z.dtype) == "bfloat16"
    # legacy class-form leaves still convert
    assert bench._sd_from_obj(bench._SD((2,), "float32")).shape == (2,)
    with pytest.raises(ValueError):
        bench._sd_from_obj("junk")


def test_layout_key_shared_across_variants(bench):
    # every variant except scan_blocks must map to one shapes file so the
    # cold-host scan_tasks fallback reuses the flagship's real init
    assert bench._shapes_path("default") == bench._shapes_path("default")
    assert bench._shapes_path("default") != bench._shapes_path("scan_blocks")


def test_watchdog_emits_best_available_record(bench, capsys, monkeypatch):
    monkeypatch.setattr(bench.os, "_exit", lambda code: None)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._PROGRESS.update(record=None, printed=False, in_compile=True)
    bench._watchdog(1.0)  # nothing measured yet -> no JSON on stdout
    assert capsys.readouterr().out == ""

    rec = {"metric": "m_partial", "value": 1.0}
    bench._PROGRESS.update(record=rec, printed=False, in_compile=False)
    bench._watchdog(1.0)
    out = capsys.readouterr().out.strip()
    assert json.loads(out) == rec
    # a second firing (or the main thread) never double-prints
    bench._watchdog(1.0)
    assert capsys.readouterr().out == ""


def test_emit_writes_post_mortem_copy(bench, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    bench._PROGRESS.update(record=None, printed=False, in_compile=False)
    bench._emit({"metric": "m", "value": 2.5})
    assert json.load(open(tmp_path / "BENCH_LAST.json"))["value"] == 2.5
