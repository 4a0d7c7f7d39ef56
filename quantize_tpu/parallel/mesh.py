"""Device mesh + sharding rules (GSPMD).

The reference is strictly single-device (``main.py:66-70``, SURVEY.md §2.3);
every distributed capability here is new, TPU-native design:

* a 2-D mesh ``(data, model)`` — batch sharded over ``data`` (DCN across
  hosts), weights/out-channels sharded over ``model`` (ICI within a slice);
* sharding *annotations only*: parameters and packed integer weights get
  PartitionSpecs, activations propagate, and XLA GSPMD inserts the
  psum/all-gather collectives;
* packed int8/int4 buffers shard on their out-channel axis exactly like the
  FP32 kernels they replace, so packed inference tensor-parallelizes the
  same way.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# leaves sharded on their last (out-channel) axis
_OUT_CHANNEL_LEAVES = {"kernel", "w_int", "w_p4", "w_p4c"}
# per-out-channel vectors
_CHANNEL_VECTOR_LEAVES = {"bias", "w_scale", "w_zero", "scale", "zero", "col_sum"}


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    """Build a (data=dp, model=tp) mesh from the first dp*tp devices."""
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


def _leaf_spec(path, leaf, tp: int) -> P:
    names = [getattr(p, "key", None) for p in path]
    name = names[-1] if names else None
    shape = getattr(leaf, "shape", ())
    if name in _OUT_CHANNEL_LEAVES and len(shape) >= 2:
        if shape[-1] % tp == 0 and shape[-1] >= tp:
            spec = [None] * len(shape)
            spec[-1] = "model"
            return P(*spec)
    if name in _CHANNEL_VECTOR_LEAVES and len(shape) == 1:
        if shape[0] % tp == 0 and shape[0] >= tp:
            return P("model")
    return P()


def spec_for_variables(variables: Dict[str, Any], tp: int) -> Dict[str, Any]:
    """PartitionSpec pytree for a variables pytree (replicate what can't shard)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_spec(path, leaf, tp), variables
    )


def shard_variables(mesh: Mesh, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Place variables onto the mesh per the tensor-parallel rules.

    Multi-process: ``device_put`` cannot target non-addressable devices, so
    leaves go through ``make_array_from_process_local_data``. Variables are
    replicated (or model-sharded within a host) along every mesh axis that
    crosses the process boundary in the supported layout (data axis =
    process axis), so the process-local view of every leaf is the full
    array and each host passes it whole."""
    tp = mesh.shape.get("model", 1)
    specs = spec_for_variables(variables, tp)

    if jax.process_count() > 1:
        def put(leaf, spec):
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), np.asarray(leaf))
    else:
        def put(leaf, spec):
            return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(
        put, variables, specs,
        is_leaf=lambda x: isinstance(x, P) or not isinstance(x, dict),
    )


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Shard the batch dim of every array in a batch dict over 'data'."""
    def put(x):
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in batch.items()}
