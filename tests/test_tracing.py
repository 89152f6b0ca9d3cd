"""Tracing harness tests."""

import jax
import jax.numpy as jnp
import numpy as np

from m3vit_tpu.models.vit import VisionTransformer
from m3vit_tpu.utils.tracing import (
    dump_trace,
    flops_of,
    load_trace,
    module_tree,
    numeric_diff,
    trace_model,
)


def test_trace_capture_and_roundtrip(tmp_path):
    model = VisionTransformer(img_size=(32, 32), patch_size=16, embed_dim=32,
                              depth=2, num_heads=4, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 3))
    v = model.init(jax.random.key(0), x)
    traces = trace_model(model, v, x,
                         filter_fn=lambda p: "attn" in p or "patch" in p)
    assert any("patch_embed" in k for k in traces)
    assert all("first" in rec and "shape" in rec for rec in traces.values())

    path = str(tmp_path / "trace.jsonl")
    dump_trace(traces, path)
    loaded = load_trace(path)
    assert set(loaded) == set(traces)

    diffs = numeric_diff(traces, loaded)
    assert max(diffs.values()) == 0.0


def test_module_tree_lists_params():
    model = VisionTransformer(img_size=(32, 32), patch_size=16, embed_dim=32,
                              depth=1, num_heads=4, dtype=jnp.float32)
    v = model.init(jax.random.key(0), jnp.ones((1, 32, 32, 3)))
    tree = module_tree(model, v)
    assert "pos_embed" in tree and "qkv" in tree


def test_flops_estimate():
    f = flops_of(lambda a, b: a @ b, jnp.ones((64, 64)), jnp.ones((64, 64)))
    if f is not None:  # cost analysis availability differs per backend
        assert f >= 2 * 64 * 64 * 64 * 0.5
