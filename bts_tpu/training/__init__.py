from bts_tpu.training.optimizer import make_optimizer, polynomial_schedule  # noqa: F401
from bts_tpu.training.trainer import Trainer, TrainState, make_train_step  # noqa: F401
