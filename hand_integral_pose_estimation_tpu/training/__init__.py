"""Training runtime: state, steps, checkpointing, runners."""

from hand_integral_pose_estimation_tpu.training.state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_optimizer,
    multistep_schedule,
)
from hand_integral_pose_estimation_tpu.training.train_step import (  # noqa: F401
    make_eval_step,
    make_train_step,
)
from hand_integral_pose_estimation_tpu.training.checkpoint import (  # noqa: F401
    latest_epoch,
    load_checkpoint,
    save_checkpoint,
)
from hand_integral_pose_estimation_tpu.training.trainer import (  # noqa: F401
    Evaluator,
    Tester,
    Trainer,
)
from hand_integral_pose_estimation_tpu.training.panet_trainer import (  # noqa: F401
    CompositePANetResult,
    PANetTrainResult,
    composite_loss_per_sample,
    train_composite_panet,
    train_panet,
)
from hand_integral_pose_estimation_tpu.training.detector_trainer import (  # noqa: F401
    DetectorTrainState,
    create_detector_train_state,
    make_detector_optimizer,
    make_detector_train_step,
)
