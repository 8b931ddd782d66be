from hand_integral_pose_estimation_tpu.utils.logger import color_logger  # noqa: F401
from hand_integral_pose_estimation_tpu.utils.timers import Timer  # noqa: F401
