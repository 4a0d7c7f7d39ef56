"""Profiling and roofline accounting.

The reference has only wall-clock meters (``runner/base.py:120-145``); the
north star requires roofline-bound kernels, so profiling is first-class:

* :func:`trace` — context manager around ``jax.profiler`` traces (view in
  TensorBoard / xprof).
* :func:`layer_costs` — static per-layer FLOP/byte accounting for a model's
  quantized compute graph, with roofline classification against chip specs.
* :class:`Timer` — dispatch-overhead-aware wall timing of jitted fns.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# chip peak specs (per chip): (dense bf16 FLOP/s, int8 OP/s, HBM bytes/s)
CHIP_SPECS = {
    "tpu_v5e": {"bf16": 197e12, "int8": 394e12, "hbm": 819e9},
    "tpu_v4": {"bf16": 275e12, "int8": 275e12, "hbm": 1228e9},
    "cpu": {"bf16": 1e11, "int8": 1e11, "hbm": 5e10},
}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (open with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class OpCost:
    name: str
    flops: float
    bytes: float
    dtype_bits: int

    @property
    def intensity(self) -> float:
        return self.flops / max(self.bytes, 1)

    def bound(self, chip: str = "tpu_v5e") -> str:
        spec = CHIP_SPECS[chip]
        peak = spec["int8"] if self.dtype_bits <= 8 else spec["bf16"]
        ridge = peak / spec["hbm"]
        return "compute" if self.intensity >= ridge else "memory"

    def min_time_s(self, chip: str = "tpu_v5e") -> float:
        spec = CHIP_SPECS[chip]
        peak = spec["int8"] if self.dtype_bits <= 8 else spec["bf16"]
        return max(self.flops / peak, self.bytes / spec["hbm"])


def _cost_from_eqn(eqn) -> Optional[OpCost]:
    prim = eqn.primitive.name
    if prim not in ("dot_general", "conv_general_dilated"):
        return None
    out = eqn.outvars[0].aval
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    bits = min(np.dtype(a.dtype).itemsize, np.dtype(b.dtype).itemsize) * 8
    if prim == "dot_general":
        dnums = eqn.params["dimension_numbers"]
        contract = dnums[0][0]
        k = int(np.prod([a.shape[d] for d in contract]))
        flops = 2 * k * int(np.prod(out.shape))
    else:
        kernel_shape = b.shape
        # HWIO: flops = 2 * out_elems * kh*kw*ci
        flops = 2 * int(np.prod(out.shape)) * int(np.prod(kernel_shape[:-1]))
    bytes_ = sum(
        int(np.prod(v.aval.shape)) * np.dtype(v.aval.dtype).itemsize
        for v in (*eqn.invars, *eqn.outvars)
        if hasattr(v, "aval") and hasattr(v.aval, "shape")
    )
    return OpCost(prim, float(flops), float(bytes_), bits)


def layer_costs(fn: Callable, *args, chip: str = "tpu_v5e") -> List[OpCost]:
    """Trace ``fn`` and account every matmul/conv: FLOPs, bytes, roofline."""
    jaxpr = jax.make_jaxpr(fn)(*args)

    costs: List[OpCost] = []

    def walk(jxp):
        for eqn in jxp.eqns:
            c = _cost_from_eqn(eqn)
            if c is not None:
                costs.append(c)
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    walk(p.jaxpr)
                elif isinstance(p, (list, tuple)):
                    for pp in p:
                        if hasattr(pp, "jaxpr"):
                            walk(pp.jaxpr)

    walk(jaxpr.jaxpr)
    return costs


def roofline_report(fn: Callable, *args, chip: str = "tpu_v5e") -> Dict[str, Any]:
    """Aggregate roofline summary of a forward function."""
    costs = layer_costs(fn, *args, chip=chip)
    total_flops = sum(c.flops for c in costs)
    total_bytes = sum(c.bytes for c in costs)
    min_time = sum(c.min_time_s(chip) for c in costs)
    return {
        "n_ops": len(costs),
        "total_gflops": total_flops / 1e9,
        "total_mbytes": total_bytes / 1e6,
        "compute_bound_ops": sum(1 for c in costs if c.bound(chip) == "compute"),
        "memory_bound_ops": sum(1 for c in costs if c.bound(chip) == "memory"),
        "speed_of_light_ms": min_time * 1e3,
    }


class Timer:
    """Wall-clock timing with warmup + block_until_ready."""

    def __init__(self, fn: Callable, warmup: int = 2, iters: int = 10):
        self.fn = fn
        self.warmup = warmup
        self.iters = iters

    def __call__(self, *args) -> float:
        for _ in range(self.warmup):
            jax.block_until_ready(self.fn(*args))
        t0 = time.perf_counter()
        for _ in range(self.iters):
            out = self.fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / self.iters
