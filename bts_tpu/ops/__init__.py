from bts_tpu.ops.lpg import local_planar_guidance, lpg_reference  # noqa: F401
from bts_tpu.ops.silog import silog_loss  # noqa: F401
