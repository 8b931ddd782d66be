from hand_integral_pose_estimation_tpu.utils.logger import color_logger  # noqa: F401
from hand_integral_pose_estimation_tpu.utils.timers import Timer  # noqa: F401
from hand_integral_pose_estimation_tpu.utils.metrics_writer import MetricsWriter  # noqa: F401
from hand_integral_pose_estimation_tpu.utils.visualize import hand_traces_3d, plot_hand  # noqa: F401
