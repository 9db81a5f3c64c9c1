"""Driver-contract tests for __graft_entry__ (SURVEY.md §4: the multichip
dryrun is the driver's correctness gate for the sharded train step).

Under the test conftest the virtual 8-CPU mesh already exists, so
dryrun_multichip(8) exercises the direct (non-respawn) path; the respawn
path is covered by running the module in a subprocess with a fresh env
capped at 1 visible device.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_direct():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    g.dryrun_multichip(8)  # conftest provisions 8 virtual CPU devices


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    # Fresh interpreter with only 1 virtual CPU device visible: the entry
    # point must respawn itself onto an 8-device virtual mesh and pass.
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,  # includes the 2-process gloo stage (cold compile)
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "8 devices OK" in proc.stdout
