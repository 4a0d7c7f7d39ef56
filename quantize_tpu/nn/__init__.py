from .intercept import QuantCtx
from .layers import (
    FP32, LayerQuantCfg, QuantConv, QuantDense, QuantGlobalAvgPool, QuantMaxPool, QuantReLU,
)
from .quantizer import Quantizer, quantize_with_qparams

__all__ = [
    "QuantCtx", "FP32", "LayerQuantCfg",
    "QuantConv", "QuantDense", "QuantGlobalAvgPool", "QuantMaxPool", "QuantReLU",
    "Quantizer", "quantize_with_qparams",
]
