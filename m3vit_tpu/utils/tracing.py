"""Numerical tracing harness: capture intermediate layer outputs for
cross-framework diffing against the PyTorch reference.

The reference uses forward hooks dumping shapes + first-100 values of
patch_embed, early blocks, and head convs to forward_hook.log, tagged with
dataset indices (reference: utils/tracing.py:56-210, DatasetWithIndex
:13-30).  flax has no hooks; the equivalent mechanisms here:

  * capture_intermediates — run any flax model with
    `capture_intermediates=True` and dump a filtered, ordered summary
    (shape, dtype, first-K values, mean/std) to a log file
  * trace_summary — same summary for an arbitrary pytree of arrays
  * numeric_diff — compare two trace dicts (ours vs a reference dump)

Also includes the constructor-logging equivalent (module_tree) and a
jax.profiler context helper.
"""

from __future__ import annotations

import contextlib
import json
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _summarize(x, first_k: int = 100) -> Dict:
    arr = np.asarray(x)
    flat = arr.reshape(-1)
    return {
        "shape": list(arr.shape),
        "dtype": str(arr.dtype),
        "mean": float(flat.astype(np.float64).mean()) if flat.size else 0.0,
        "std": float(flat.astype(np.float64).std()) if flat.size else 0.0,
        "first": flat[:first_k].astype(np.float64).round(6).tolist(),
    }


def trace_model(
    model,
    variables: Dict,
    *args,
    filter_fn: Optional[Callable[[str], bool]] = None,
    first_k: int = 100,
    **kwargs,
) -> Dict[str, Dict]:
    """Run model.apply with intermediate capture; return {path: summary}.

    filter_fn receives the '/'-joined module path; default keeps everything.
    """
    out, state = model.apply(
        variables, *args, capture_intermediates=True,
        mutable=["intermediates"], **kwargs,
    )
    traces: Dict[str, Dict] = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{path}/{k}" if path else str(k))
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, f"{path}[{i}]")
        elif hasattr(tree, "shape"):
            if filter_fn is None or filter_fn(path):
                traces[path] = _summarize(tree, first_k)

    walk(state["intermediates"], "")
    return traces


def dump_trace(traces: Dict[str, Dict], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for name in sorted(traces):
            f.write(json.dumps({"layer": name, **traces[name]}) + "\n")


def load_trace(path: str) -> Dict[str, Dict]:
    out = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            out[rec.pop("layer")] = rec
    return out


def numeric_diff(a: Dict[str, Dict], b: Dict[str, Dict],
                 atol: float = 1e-4) -> Dict[str, float]:
    """Max abs diff of the stored value prefixes for layers present in both."""
    diffs = {}
    for k in sorted(set(a) & set(b)):
        va, vb = a[k].get("first", []), b[k].get("first", [])
        n = min(len(va), len(vb))
        if n:
            diffs[k] = float(
                np.abs(np.asarray(va[:n]) - np.asarray(vb[:n])).max()
            )
    return diffs


def module_tree(model, variables) -> str:
    """Constructor-logging equivalent: the module/param tree with shapes
    (reference tracing.py:228-316 monkeypatches __init__ to print args)."""
    lines = []

    def walk(tree, path, depth):
        for k, v in tree.items():
            if isinstance(v, dict):
                lines.append("  " * depth + f"{k}/")
                walk(v, f"{path}/{k}", depth + 1)
            else:
                lines.append(
                    "  " * depth + f"{k}: {tuple(v.shape)} {v.dtype}"
                )

    walk(variables.get("params", variables), "", 0)
    return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (the --time/--flops analog; view the dump
    with tensorboard's profile plugin or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_of(fn: Callable, *args) -> Optional[float]:
    """Static FLOPs estimate via XLA cost analysis (the thop --flops analog,
    reference main.py:97-108)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", -1.0))
    except Exception:
        return None
