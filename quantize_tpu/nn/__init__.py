from ..utils.registry import Registry
from .attention import QuantMultiheadAttention
from .intercept import QuantCtx
from .layers import (
    FP32, LayerQuantCfg, QuantConv, QuantDense, QuantGlobalAvgPool, QuantMaxPool, QuantReLU,
)
from .quantizer import Quantizer, quantize_with_qparams

# Quant-module registry (reference MODULES, modelzoo/modules/__init__.py:16-24)
MODULES = Registry("quant modules")
MODULES.register_dict({
    "quantizer": Quantizer,
    "quantlinear": QuantDense,
    "quantconv2d": QuantConv,
    "quantrelu": QuantReLU,
    "quantmaxpool2d": QuantMaxPool,
    "quantadaptiveavgpool2d": QuantGlobalAvgPool,
    "quantmultiheadattention": QuantMultiheadAttention,
})

__all__ = [
    "QuantCtx", "FP32", "LayerQuantCfg", "MODULES",
    "QuantConv", "QuantDense", "QuantGlobalAvgPool", "QuantMaxPool", "QuantReLU",
    "QuantMultiheadAttention", "Quantizer", "quantize_with_qparams",
]
