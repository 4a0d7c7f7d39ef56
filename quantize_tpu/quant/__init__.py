from .qspec import (
    QuantSpec, qrange, compute_scale_zero, quant_range_denominator,
    broadcast_to_axis, canon_granularity,
)
from .fakequant import (
    ste_round, ste_floor_plus, quantize_core, dequantize_core, fake_quant, quantize_int,
)
from .observers import (
    RANGES, MinMax, MAMinMax, MSE, CrossEntropy, ACIQ, AWQ, BiasCorrect,
    build_observer, channel_view,
)
from .adaround import (
    rect_sigmoid, init_v, regularization, adaround_round, beta_schedule,
)
from .pack import (
    PackDescriptor, tpack, tunpack, pack_int4_pairs, unpack_int4_pairs,
)

__all__ = [
    "QuantSpec", "qrange", "compute_scale_zero", "quant_range_denominator",
    "broadcast_to_axis", "canon_granularity",
    "ste_round", "ste_floor_plus", "quantize_core", "dequantize_core",
    "fake_quant", "quantize_int",
    "RANGES", "MinMax", "MAMinMax", "MSE", "CrossEntropy", "ACIQ", "AWQ",
    "BiasCorrect", "build_observer", "channel_view",
    "rect_sigmoid", "init_v", "regularization", "adaround_round", "beta_schedule",
    "PackDescriptor", "tpack", "tunpack", "pack_int4_pairs", "unpack_int4_pairs",
]
