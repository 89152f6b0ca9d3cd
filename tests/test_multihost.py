"""2-process jax.distributed smoke (the reference's multi-node NCCL
bring-up, train_fastmoe.py:268-312, exercised for real on CPU).

Spawns scripts/multihost_smoke.py twice: each process brings 4 virtual CPU
devices, `jax.distributed.initialize` joins them, and ONE flagship-shaped
train step runs over the global 2x4 (data, expert) mesh with expert params
sharded across the 'expert' axis.  This removes the round-1 caveat that
`--multihost` was wired but never executed.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_smoke.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step():
    port = _free_port()
    env = dict(os.environ)
    # children pick their own platform/device-count; scrub this process's
    # test-local forcing so it doesn't double up
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}:\n{out[-4000:]}"
        assert "multihost smoke ok" in out, out[-4000:]
