"""Logging: rank-aware stdout tee + structured metric logger.

reference: utils/logger.py (stdout tee to log_file.txt) and
utils/wandb_logger.py (singleton with train/val/best/analysis namespaces).
wandb is optional — when unavailable or disabled, metrics go to a jsonl file
with the same namespaced keys so downstream tooling sees one schema.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional


class Tee:
    """Mirror stdout/stderr into a log file (reference Logger, logger.py:9-43)."""

    def __init__(self, path: str, stream):
        self.stream = stream
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self.f = open(path, "a")

    def write(self, data):
        self.stream.write(data)
        self.f.write(data)

    def flush(self):
        self.stream.flush()
        self.f.flush()


def setup_stdout_tee(output_dir: str) -> None:
    sys.stdout = Tee(os.path.join(output_dir, "log_file.txt"), sys.stdout)
    sys.stderr = Tee(os.path.join(output_dir, "log_file.txt"), sys.stderr)


class MetricLogger:
    """Namespaced metric logging: wandb when available, jsonl always."""

    def __init__(self, output_dir: str, use_wandb: bool = False,
                 config: Optional[Dict] = None, run_name: Optional[str] = None,
                 project: Optional[str] = None, entity: Optional[str] = None):
        os.makedirs(output_dir, exist_ok=True)
        self.jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self.step = 0
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(
                    project=project or "m3vit_tpu", name=run_name,
                    entity=entity,
                    config={k: str(v) for k, v in (config or {}).items()},
                )
            except Exception as e:  # wandb not installed / no network
                print(f"[logger] wandb unavailable ({e}); jsonl only")

    def log(self, metrics: Dict, step: Optional[int] = None):
        step = step if step is not None else self.step
        self.step = max(self.step, step + 1)
        rec = {"_step": step, "_t": time.time()}
        rec.update({k: _to_py(v) for k, v in metrics.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def log_train_losses(self, losses: Dict, epoch: int, step: int):
        self.log({f"train/{k}": v for k, v in losses.items()}
                 | {"train/epoch": epoch}, step)

    def log_val_performance(self, results: Dict, epoch: int):
        flat = _flatten("val", results)
        flat["val/epoch"] = epoch
        self.log(flat)

    def log_best(self, results: Dict, epoch: int):
        flat = _flatten("best", results)
        flat["best/epoch"] = epoch
        self.log(flat)

    def log_moe_stats(self, stats: Dict, step: int):
        self.log({f"analysis/{k}": v for k, v in stats.items()}, step)


def _to_py(v):
    try:
        import numpy as np

        if isinstance(v, (np.ndarray,)):
            return v.tolist()
        if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
            return v.item()
    except Exception:
        pass
    if isinstance(v, (list, tuple, dict, str, int, float, bool, type(None))):
        return v
    try:
        return float(v)
    except Exception:
        return str(v)


def _flatten(prefix: str, d: Dict) -> Dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(key, v))
        else:
            out[key] = _to_py(v)
    return out
