"""Every checked-in YAML under configs/ must parse and build a config.

Regression test for an invalid-YAML edit that broke the flagship config
(a top-level key inserted mid-way through an indented block): yaml.safe_load
raised 'mapping values are not allowed here' and the README's training
command crashed at config load.
"""

import glob
import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_YML = sorted(
    glob.glob(os.path.join(REPO, "configs", "**", "*.yml"), recursive=True)
)
EXP_YML = [f for f in ALL_YML if os.path.basename(f) != "path_env.yml"]


@pytest.mark.parametrize("path", ALL_YML, ids=lambda p: os.path.relpath(p, REPO))
def test_yaml_parses(path):
    with open(path) as f:
        cfg = yaml.safe_load(f)
    assert isinstance(cfg, dict) and cfg, f"{path} is not a non-empty mapping"


@pytest.mark.parametrize("path", EXP_YML, ids=lambda p: os.path.relpath(p, REPO))
def test_create_config_builds(path, tmp_path):
    """create_config must succeed on every experiment YAML (no env paths
    needed: dataset roots are only resolved at dataset-build time)."""
    from m3vit_tpu.config import create_config

    p = create_config(None, path, args={"root_dir": str(tmp_path)})
    assert p["TASKS"], path
    # the flagship's MoE knobs must land at top level where factory.py reads them
    if os.path.basename(path) == "vit_moe_small_multi_task.yml":
        assert p.get("moe_capacity_factor") == 1.25
        assert p["moe_experts"] == 16


@pytest.mark.parametrize("path", EXP_YML, ids=lambda p: os.path.relpath(p, REPO))
def test_build_model_constructs(path, tmp_path):
    """The factory must accept every checked-in experiment config (flax
    modules are dataclasses — construction is cheap, no init)."""
    from m3vit_tpu.config import create_config
    from m3vit_tpu.models.factory import build_model

    p = create_config(None, path, args={"root_dir": str(tmp_path)})
    model = build_model(p)
    assert model is not None
