"""quantize_tpu — a TPU-native neural-network quantization framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
library JingInAI/Quantize: PTQ / AdaRound / QAT pipelines, pluggable
calibration observers, packed low-bit inference via fused Pallas kernels, and
GSPMD multi-host scaling.
"""

__version__ = "0.1.0"
