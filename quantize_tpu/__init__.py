"""quantize_tpu — a TPU-native neural-network quantization framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
library JingInAI/Quantize: PTQ / AdaRound / QAT pipelines, pluggable
calibration observers, packed low-bit inference via fused Pallas kernels, and
GSPMD multi-host scaling.

Public surface (lazily imported — ``import quantize_tpu`` stays cheap):

* ``MODELS`` / ``QuantCtx`` — build any zoo model quantization-aware
* ``init_model`` / ``calibrate_model`` — library-call PTQ workflow
* ``pack_model`` / ``unpack_model`` / ``model_size_bytes`` — deploy export
* ``execute_runner`` / ``Config`` — the CLI pipeline as a function
* ``reset_observers`` — restart calibration after weight swaps
* ``make_mesh`` / ``shard_variables`` / ``measure_scaling`` — multi-chip
"""

__version__ = "0.2.0"

_EXPORTS = {
    "MODELS": ("quantize_tpu.models", "MODELS"),
    "QuantCtx": ("quantize_tpu.nn.intercept", "QuantCtx"),
    "init_model": ("quantize_tpu.api", "init_model"),
    "calibrate_model": ("quantize_tpu.api", "calibrate_model"),
    "pack_model": ("quantize_tpu.deploy", "pack_model"),
    "unpack_model": ("quantize_tpu.deploy", "unpack_model"),
    "model_size_bytes": ("quantize_tpu.deploy", "model_size_bytes"),
    "execute_runner": ("quantize_tpu.runners", "execute_runner"),
    "Config": ("quantize_tpu.utils.config", "Config"),
    "reset_observers": ("quantize_tpu.nn.quantizer", "reset_observers"),
    "make_mesh": ("quantize_tpu.parallel", "make_mesh"),
    "shard_variables": ("quantize_tpu.parallel", "shard_variables"),
    "measure_scaling": ("quantize_tpu.parallel", "measure_scaling"),
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module, attr = _EXPORTS[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
