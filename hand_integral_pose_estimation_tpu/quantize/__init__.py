"""Int8 post-training quantization for the serving path (see ptq.py)."""

from hand_integral_pose_estimation_tpu.quantize.ptq import (
    Quantized,
    calibrate,
    quantize_model,
    quantize_params,
    quantized_apply,
    quantized_calls,
)

__all__ = [
    "Quantized",
    "calibrate",
    "quantize_model",
    "quantize_params",
    "quantized_apply",
    "quantized_calls",
]
