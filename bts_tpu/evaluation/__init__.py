from bts_tpu.evaluation.metrics import METRIC_NAMES, compute_errors, compute_errors_jnp  # noqa: F401
