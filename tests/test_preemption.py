"""Preemption-safe training (utils/preemption.py; SURVEY.md §5 failure
recovery).

TPU VMs get a SIGTERM with a short grace window on preemption/maintenance;
the guard must turn that into: finish the in-flight step, write a final
checkpoint, exit 0 — and a rerun of the same command must resume
sample-exactly from the saved step.  The integration test delivers a REAL
SIGTERM to a subprocess running the public CLI and then resumes in a second
subprocess.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "preempt_worker.py")


def test_guard_flag_and_uninstall():
    from bts_tpu.utils.preemption import PreemptionGuard

    # use SIGUSR1 so a failure can't tear down the pytest process
    guard = PreemptionGuard(signals=(signal.SIGUSR1,), sync_freq=10)
    try:
        assert not guard.preempted
        assert not guard.should_stop(1)
        os.kill(os.getpid(), signal.SIGUSR1)
        time.sleep(0.05)
        assert guard.preempted
        # single-process: stops immediately, no waiting for the sync cadence
        assert guard.should_stop(1)
        assert guard.should_stop(7)
    finally:
        prev = guard._prev.get(signal.SIGUSR1)
        guard.uninstall()
    assert signal.getsignal(signal.SIGUSR1) is prev


def test_guard_handler_chain_restored():
    from bts_tpu.utils.preemption import PreemptionGuard

    hits = []
    old = signal.signal(signal.SIGUSR1, lambda s, f: hits.append(s))
    try:
        guard = PreemptionGuard(signals=(signal.SIGUSR1,))
        guard.uninstall()
        os.kill(os.getpid(), signal.SIGUSR1)
        time.sleep(0.05)
        assert hits  # the pre-existing handler is back in place
    finally:
        signal.signal(signal.SIGUSR1, old)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rng = np.random.default_rng(3)
    lines = []
    for i in range(4):
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        d = (rng.uniform(0.5, 9.5, (480, 640)) * 1000).astype(np.uint16)
        Image.fromarray(img).save(root / "rgb" / f"{i}.png")
        Image.fromarray(d).save(root / "depth" / f"{i}.png")
        lines.append(f"rgb/{i}.png depth/{i}.png 518.8579")
    (root / "split.txt").write_text("\n".join(lines))
    return root


def _args_file(root, num_epochs: int) -> str:
    # geometry matches tests/test_cli.py so the persistent compile cache hits
    path = root / f"args_{num_epochs}.txt"
    path.write_text(
        "\n".join(
            [
                "--mode train",
                "--model_name preempt_test",
                "--encoder mobilenetv2_bts",
                "--dataset nyu",
                f"--data_path {root}",
                f"--gt_path {root}",
                f"--filenames_file {root}/split.txt",
                "--input_height 64",
                "--input_width 96",
                "--max_depth 10",
                "--batch_size 2",
                f"--num_epochs {num_epochs}",
                "--bts_size 64",
                "--compute_dtype float32",
                "--log_freq 1",
                "--num_devices 1",
                "--save_freq 1000",  # ONLY the preemption save writes a ckpt
                f"--log_directory {root}/runs",
            ]
        )
    )
    return str(path)


@pytest.mark.slow
def test_sigterm_checkpoints_and_resumes(dataset):
    """SIGTERM mid-run -> exit 0 + checkpoint at the break step; rerunning
    the same logdir resumes from it and completes."""
    env = dict(os.environ)
    logdir = os.path.join(str(dataset), "runs", "preempt_test")
    out_path = os.path.join(str(dataset), "preempt_out.txt")

    # long run (100 steps) we will interrupt after a couple of steps
    with open(out_path, "w") as out:
        proc = subprocess.Popen(
            [sys.executable, WORKER, _args_file(dataset, 50)],
            env=env,
            cwd=REPO,
            stdout=out,
            stderr=subprocess.STDOUT,
            text=True,
        )
        deadline = time.time() + 600
        try:
            while time.time() < deadline:
                with open(out_path) as f:
                    txt = f.read()
                if "step 2/" in txt:
                    break
                if proc.poll() is not None:
                    pytest.fail(f"worker exited early:\n{txt}")
                time.sleep(0.5)
            else:
                pytest.fail(f"never reached step 2:\n{txt}")
            proc.send_signal(signal.SIGTERM)
            rc = proc.wait(timeout=300)
        finally:
            if proc.poll() is None:
                proc.kill()
    log = open(out_path).read()
    assert rc == 0, f"preempted run must exit 0:\n{log}"
    assert "received signal" in log and "preempted: checkpoint saved" in log, log

    ckpt = os.path.join(logdir, "ckpt")
    steps = sorted(int(d) for d in os.listdir(ckpt) if d.isdigit())
    assert steps, f"no checkpoint written under {ckpt}"
    assert steps[-1] < 100, "stopped run must checkpoint BEFORE the full run length"

    # resume: same logdir, shorter target (6 steps) so completion is fast;
    # must pick up at the preemption step, not restart from 0
    res = subprocess.run(
        [sys.executable, WORKER, _args_file(dataset, 3)],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert f"resumed @ step {steps[-1]}" in res.stdout, res.stdout
    assert "done at step 6" in res.stdout, res.stdout
