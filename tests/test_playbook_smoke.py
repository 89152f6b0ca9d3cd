"""Drill the real-data playbook end-to-end (round-2 VERDICT item 9).

Runs `scripts/run_when_mounted.sh --smoke`: fabricates PASCAL_MT / NYUD_MT /
cityscapes trees (scripts/fabricate_dataset.py), shrinks the REAL config
files to tiny scale (scripts/shrink_config.py), then executes all three
playbook stages — overfit stage for the five BASELINE setups, the five
single-task Δm anchors, and the flagship train + save-predictions eval —
so the script's own plumbing (env-config generation, config paths, loss
parsing, eval protocol) is proven before real data ever mounts.

Slow (many CLI invocations); kept as ONE test so a pass/fail maps 1:1 to
the playbook being runnable.
"""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_when_mounted_smoke():
    env = dict(os.environ)
    # the CLI must see the repo and the axon site (CLAUDE.md: keep
    # /root/.axon_site on PYTHONPATH); --platform cpu is set by --smoke
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # conftest's 8-virtual-device XLA_FLAGS must NOT leak into the drill:
    # the playbook CLIs run single-device (batch 4 cannot shard over 8
    # fake devices — the loader would yield zero batches)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "run_when_mounted.sh"),
         "--smoke"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=5400,
    )
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-40:])
    assert proc.returncode == 0, f"smoke drill failed:\n{tail}"
    assert "SMOKE PASSED" in proc.stdout, tail
    assert "stage 0 (reference interop) PASSED" in proc.stdout, tail
    assert "stage 1 (overfit-64) PASSED" in proc.stdout, tail
    assert "stage 2 (anchors) DONE" in proc.stdout, tail
