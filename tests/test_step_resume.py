"""Step-granularity (mid-epoch) checkpoint / resume.

The reference resumes at epoch granularity only (SURVEY.md §5: "no mid-epoch
checkpointing").  On preemptible TPU pods the trainer must checkpoint and
resume at step granularity, and the resumed trajectory must be EXACTLY the
uninterrupted one: the loader is deterministic in (seed, epoch) and the step
rng is folded with state.step, so (epoch, next_it) fully determines the rest
of the run.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "smoke", "tiny_moe_synthetic.yml")
ENV = os.path.join(REPO, "configs", "path_env.yml")


def _args(save_dir, extra=()):
    return [
        "--config_env", ENV, "--config_exp", CFG,
        "--synthetic", "4", "--epochs", "2", "--log_interval", "1",
        "--save_dir", str(save_dir), "--n_expert", "1",
        *extra,
    ]


def _losses(save_dir):
    """metrics.jsonl -> {global_step: train/total_loss} (last record wins)."""
    path = os.path.join(save_dir, "PASCALContext", "vit_tiny_test",
                        "metrics.jsonl")
    out = {}
    for line in open(path):
        r = json.loads(line)
        if "train/total_loss" in r:
            out[r["_step"]] = r["train/total_loss"]
    return out


def test_stop_resume_matches_uninterrupted(tmp_path):
    from m3vit_tpu.cli.train import main

    # run A: 2 epochs x 4 synthetic steps, uninterrupted
    a_dir = tmp_path / "a"
    main(_args(a_dir))
    a = _losses(a_dir)
    assert sorted(a) == list(range(8))

    # run B: stop mid-epoch after 3 steps (checkpoint saved), then resume
    b_dir = tmp_path / "b"
    main(_args(b_dir, ["--stop_after_steps", "3", "--ckpt_every_steps", "2"]))
    step_dir = os.path.join(b_dir, "PASCALContext", "vit_tiny_test",
                            "step_checkpoint")
    assert os.path.isdir(step_dir)
    b_partial = _losses(b_dir)
    assert sorted(b_partial) == [0, 1, 2]

    main(_args(b_dir, ["--resume"]))
    b = _losses(b_dir)
    assert sorted(b) == list(range(8))

    # exact trajectory equality: pre-stop steps trivially match (same seed);
    # post-resume steps match only if the restored (params, opt state, step)
    # and the replayed batches/rng are identical to the uninterrupted run
    for s in range(8):
        np.testing.assert_allclose(
            b[s], a[s], rtol=0, atol=0,
            err_msg=f"trajectory diverged at global step {s}")


def test_stop_at_epoch_boundary_runs_pending_epoch_end(tmp_path):
    """Preemption on an epoch's LAST step (next_it == steps_per_epoch):
    resume must still run that epoch's eval + epoch checkpoint before
    moving on (review finding: these were silently skipped)."""
    from m3vit_tpu.cli.train import main

    d = tmp_path / "b"
    main(_args(d, ["--stop_after_steps", "4"]))  # exactly epoch 0's 4 steps
    run_dir = os.path.join(d, "PASCALContext", "vit_tiny_test")
    assert not os.path.isdir(os.path.join(run_dir, "checkpoint"))

    main(_args(d, ["--resume"]))
    # epoch-0 eval happened on resume...
    recs = [json.loads(l) for l in open(os.path.join(run_dir,
                                                     "metrics.jsonl"))]
    val_epochs = {r["val/epoch"] for r in recs if "val/epoch" in r}
    assert {0, 1} <= val_epochs
    # ...and both epoch checkpoints exist
    from m3vit_tpu.utils.checkpoint import latest_epoch

    assert latest_epoch(os.path.join(run_dir, "checkpoint")) == 1
    # trajectory equals the uninterrupted run
    a_dir = tmp_path / "a"
    main(_args(a_dir))
    a, b = _losses(a_dir), _losses(d)
    assert sorted(b) == sorted(a)
    for s in a:
        np.testing.assert_allclose(b[s], a[s], rtol=0, atol=0)


def test_save_checkpoint_overwrites_existing_step(tmp_path):
    """Re-running into an existing output dir must overwrite, not crash:
    orbax's force=True only bypasses save_interval — an existing step raised
    StepAlreadyExistsError (reference torch.save overwrites,
    train/train_utils.py save path)."""
    from m3vit_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    d = str(tmp_path / "ckpt")
    state = {"w": np.ones((3,), np.float32)}
    save_checkpoint(d, state, epoch=0)
    state2 = {"w": np.full((3,), 7.0, np.float32)}
    save_checkpoint(d, state2, epoch=0)  # same step: must overwrite
    restored, meta = restore_checkpoint(d, state, epoch=0)
    np.testing.assert_array_equal(restored["w"], state2["w"])


@pytest.mark.slow
def test_sigterm_preemption_saves_and_resumes(tmp_path):
    """Preemption drill: SIGTERM mid-training -> clean exit with a step
    checkpoint; --resume continues from it."""
    save_dir = tmp_path / "p"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # persistent compile cache: the subprocess compiles the tiny train step
    # from scratch; under full-suite CPU contention that can exceed the
    # first-step deadline without one
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/m3vit_jax_cache_cpu"
    proc = subprocess.Popen(
        [sys.executable, "-m", "m3vit_tpu.cli.train",
         *_args(save_dir, ["--epochs", "50", "--platform", "cpu"])],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    run_dir = os.path.join(save_dir, "PASCALContext", "vit_tiny_test")
    jsonl = os.path.join(run_dir, "metrics.jsonl")
    try:
        deadline = time.time() + 900
        # wait until at least one train step has logged, then preempt
        while time.time() < deadline:
            if os.path.isfile(jsonl) and any(
                    "train/total_loss" in l for l in open(jsonl)):
                break
            if proc.poll() is not None:
                pytest.fail(f"trainer died early:\n{proc.stdout.read()}")
            time.sleep(1.0)
        else:
            pytest.fail("trainer never logged a step")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, f"non-clean exit {proc.returncode}:\n{out}"
    assert "[SIGTERM] step checkpoint saved" in out
    assert os.path.isdir(os.path.join(run_dir, "step_checkpoint"))
    # resume equivalence itself is covered (exactly) by
    # test_stop_resume_matches_uninterrupted; here we proved the signal path
