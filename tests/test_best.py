"""BestTracker: per-metric improvement directions + JSON persistence.

Reference parity (SURVEY.md §2.1 [M]): the train driver keeps best values
of the 9 eval metrics (silog..log_rms lower-better, d1..d3 higher-better)
and replaces per-metric best checkpoints on improvement.
"""

import numpy as np

from bts_tpu.evaluation.best import HIGHER_BETTER, LOWER_BETTER, BestTracker
from bts_tpu.evaluation.metrics import METRIC_NAMES


def _results(**over):
    base = {
        "silog": 10.0, "abs_rel": 0.10, "log10": 0.05, "rms": 4.0,
        "sq_rel": 0.8, "log_rms": 0.2, "d1": 0.90, "d2": 0.97, "d3": 0.99,
    }
    base.update(over)
    return [base[n] for n in METRIC_NAMES]


def test_direction_partition():
    assert LOWER_BETTER | HIGHER_BETTER == set(METRIC_NAMES)
    assert LOWER_BETTER == {"silog", "abs_rel", "log10", "rms", "sq_rel", "log_rms"}
    assert HIGHER_BETTER == {"d1", "d2", "d3"}


def test_tracker_directions_and_persistence(tmp_path):
    t = BestTracker(str(tmp_path))
    # first eval: everything is a new best
    assert t.update(100, _results()) == list(METRIC_NAMES)

    # lower abs_rel improves; lower d1 does NOT (higher-better)
    improved = t.update(200, _results(abs_rel=0.08, d1=0.85))
    assert improved == ["abs_rel"]
    assert t.best["abs_rel"] == {"value": 0.08, "step": 200}
    assert t.best["d1"] == {"value": 0.90, "step": 100}

    # higher d2 improves; equal values never do; NaN never does
    improved = t.update(300, _results(d2=0.98, silog=float("nan")))
    assert improved == ["d2"]

    # persistence: a fresh tracker resumes against the same bar
    t2 = BestTracker(str(tmp_path))
    assert t2.best == t.best
    assert t2.update(400, _results()) == []  # nothing beats the history


def test_tracker_accepts_numpy_results(tmp_path):
    t = BestTracker(str(tmp_path))
    improved = t.update(1, np.asarray(_results(), dtype=np.float64))
    assert improved == list(METRIC_NAMES)
    # json round-trip stored plain floats
    t2 = BestTracker(str(tmp_path))
    assert isinstance(t2.best["rms"]["value"], float)
