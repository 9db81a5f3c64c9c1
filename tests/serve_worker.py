"""Subprocess target for the bts_serve SIGTERM-drain test.

Runs the REAL serving CLI (``bts_tpu.cli.bts_serve``) on the CPU platform so
the parent test can deliver a genuine SIGTERM — the handler interacts with
``serve_forever`` on the main thread, which in-process pytest can't exercise.

Usage: ``python serve_worker.py <flags...>``
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

from bts_tpu.cli.bts_serve import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
