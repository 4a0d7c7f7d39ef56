"""Deterministic per-parameter weight generation shared by the golden-model
fixture generator (``scripts/gen_golden_models.py``, torch side) and its
replay test (``tests/test_golden_models.py``, JAX side).

Every parameter/buffer is derived purely from its (torch-layout) name and
shape, so fixtures only need to record names+shapes — no weight blobs.
Scales follow He-style fan-in normalisation so a randomly-weighted 18-layer
network keeps activations in a sane range (quantization stays meaningful).
"""
from __future__ import annotations

import zlib

import numpy as np


def gen_param(name: str, shape: tuple) -> np.ndarray:
    rng = np.random.default_rng(zlib.crc32(name.encode()) & 0xFFFFFFFF)
    a = rng.normal(size=shape).astype(np.float32)
    leaf = name.rsplit(".", 1)[-1]
    if leaf in ("weight", "in_proj_weight") and len(shape) >= 2:
        fan_in = int(np.prod(shape[1:]))
        return (a / np.sqrt(fan_in)).astype(np.float32)
    if leaf == "weight":  # 1-d: BN / LayerNorm gain
        return (np.abs(a) * 0.3 + 0.8).astype(np.float32)
    if leaf in ("bias", "in_proj_bias"):
        return (a * 0.05).astype(np.float32)
    if leaf == "running_mean":
        return (a * 0.1).astype(np.float32)
    if leaf == "running_var":
        return (np.abs(a) * 0.5 + 0.5).astype(np.float32)
    return a


def gen_input(seed: int, shape: tuple, scale: float = 1.0,
              loc: float = 0.0) -> np.ndarray:
    return (np.random.default_rng(seed).normal(size=shape) * scale
            + loc).astype(np.float32)
