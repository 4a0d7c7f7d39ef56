"""Model export: StableHLO serialization (the TPU-world ONNX analog).

The reference attaches ONNX ``symbolic`` stubs to its custom ops
(``modelzoo/modules/operator/quantconv2dop.py:36-41``) for deployment
export; the JAX-native equivalent is ``jax.export``: serialize the jitted
(packed-)inference function to portable StableHLO bytes that any
XLA-compatible runtime (or IREE) can load.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def export_forward(
    model,
    variables: Dict[str, Any],
    sample_x: jnp.ndarray,
    mode: str = "packed",
) -> bytes:
    """Serialize ``model.apply(variables, x, mode=...)`` to StableHLO bytes.

    The variables are baked in as constants (deploy artifact); the input
    shape is taken from ``sample_x``.
    """
    from jax import export as jexport

    def fn(x):
        return model.apply(variables, x, mode=mode)

    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct(sample_x.shape, sample_x.dtype)
    )
    return exported.serialize()


def load_exported(payload: bytes):
    """Deserialize an exported function; returns a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(payload)
    return exported.call


def export_mlir_text(model, variables, sample_x, mode: str = "packed") -> str:
    """Human-readable StableHLO of the (packed) forward (debug/inspection)."""
    def fn(x):
        return model.apply(variables, x, mode=mode)

    lowered = jax.jit(fn).lower(jax.ShapeDtypeStruct(sample_x.shape, sample_x.dtype))
    return lowered.as_text()
