from bts_tpu.models.bts import BtsModel, create_model  # noqa: F401
from bts_tpu.models.encoders import ENCODERS, build_encoder  # noqa: F401
