from .state import TrainState, make_optimizer, make_train_state  # noqa: F401
from .step import make_detr_train_step  # noqa: F401
