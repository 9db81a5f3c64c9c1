from bts_tpu.data.crops import eigen_crop_mask, garg_crop_mask, kb_crop, nyu_border_crop  # noqa: F401
from bts_tpu.data.depth_io import depth_from_png, depth_to_png, read_depth_png, write_depth_png  # noqa: F401
