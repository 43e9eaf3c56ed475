from .state import (TrainState, make_optimizer, make_train_state,  # noqa: F401
                    onecycle_schedule)
from .step import make_detr_train_step, make_eval_step  # noqa: F401
from .trainer import Trainer  # noqa: F401
from .experiment import (get_expe_infos, params_update,  # noqa: F401
                         find_run_dir)
from .checkpoint import CheckpointManager  # noqa: F401
from .logger import make_logger, TensorBoardLogger, NoOpLogger  # noqa: F401
from .callbacks import (Callback, MetricsCallback, ApMetricsCallback,  # noqa: F401
                        ObjectDetectorCallback, PQMetricsCallback, EPECallback)
from .data_modules import CocoDetection2Detr, Data2RAFT  # noqa: F401
from .trainers import (make_detr_trainer, make_deformable_detr_trainer,  # noqa: F401
                       make_raft_trainer, make_panoptic_trainer)
