from bts_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
