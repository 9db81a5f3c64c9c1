"""Subprocess target for the preemption integration test.

Runs the REAL train CLI (``bts_tpu.cli.bts_main``) on the CPU platform so the
parent test can deliver a genuine SIGTERM to a separate process — the only
way to exercise the installed signal handler end-to-end (in-process pytest
would receive the signal itself).

Usage: ``python preempt_worker.py <args_file>``
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # appended late-ish; never via PYTHONPATH (axon site)
    sys.path.insert(0, REPO)

import jax

# Same platform override trick as tests/conftest.py (sitecustomize force-sets
# the axon TPU plugin; env vars alone don't switch it).
jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_cpu")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from bts_tpu.cli.bts_main import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main([f"@{sys.argv[1]}"]))
