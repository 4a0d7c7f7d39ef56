"""Packed-model export: simulation variables -> deploy variables.

The reference packs layer-by-layer via ``module.pack()`` calls
(``runner/ptq.py:106-114``, ``quantconv2d.py:170-196``); here packing is one
functional transform: an apply in ``mode='pack'`` writes every layer's
integer weight buffers, baked biases, and activation qparams into the
``packed`` collection, and this module strips the now-redundant FP32 tensors
for a deploy-ready variables pytree.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_W_KEYS = ("w_int", "w_p4", "w_p4c")


def pack_model(model, variables: Dict[str, Any], sample_x: jnp.ndarray) -> Dict[str, Any]:
    """Run the pack pass and return deploy variables.

    The result contains: ``packed`` (int weights + scales + baked biases +
    act qparams), ``qparams`` (for activation-only layers), and ``params``
    entries only for layers whose weights were NOT quantized (plus
    batch_stats if BN was not folded).
    """
    _, upd = model.apply(variables, sample_x, mode="pack", mutable=["packed"])
    packed = upd["packed"]

    params = _strip_packed_params(variables.get("params", {}), packed)
    deploy = {"packed": packed, "params": params}
    # carry non-simulation collections through to deploy: qparams (for
    # activation-only layers), batch_stats (unfolded BN), zeroshot (CLIP
    # class weights), and any future model-owned state. Observer state,
    # taps, and AdaRound V are simulation-only.
    for col, val in variables.items():
        if col not in ("params", "packed", "qobs", "taps", "adaround"):
            deploy[col] = val
    return deploy


def _strip_packed_params(params: Any, packed: Any) -> Any:
    """Drop kernel+bias for every module whose packed subtree holds an
    integer weight (the weight and bias are baked into ``packed``)."""
    if not isinstance(params, dict):
        return params
    out = {}
    for k, v in params.items():
        pk = packed.get(k, {}) if isinstance(packed, dict) else {}
        if isinstance(v, dict):
            if any(w in pk for w in _W_KEYS):
                kept = {kk: vv for kk, vv in v.items() if kk not in ("kernel", "bias")}
                if kept:
                    out[k] = _strip_packed_params(kept, pk)
            else:
                sub = _strip_packed_params(v, pk)
                if sub != {}:
                    out[k] = sub
        else:
            out[k] = v
    return out


def unpack_model(deploy: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse transform: deploy variables -> simulation-style variables.

    Dequantizes every packed integer weight back to float kernels (the
    reference's load-time ``tunpack`` path, ``quantconv2d.py:218-235``) so a
    packed checkpoint can resume fake-quant evaluation or fine-tuning.
    """
    from .ops.pallas.qmatmul import unpack_int4_splithalf
    from .quant.pack import unpack_int4_pairs

    params = _deepcopy(deploy.get("params", {}))

    def walk(packed_node: Dict[str, Any], params_node: Dict[str, Any]) -> None:
        for k, v in packed_node.items():
            if not isinstance(v, dict):
                continue
            if any(w in v for w in _W_KEYS):
                if "w_p4" in v:
                    w_int = unpack_int4_splithalf(jnp.asarray(v["w_p4"]))
                elif "w_p4c" in v:
                    w_int = unpack_int4_pairs(jnp.asarray(v["w_p4c"]), axis=2)
                else:
                    w_int = jnp.asarray(v["w_int"])
                scale = jnp.asarray(v["w_scale"])
                zero = jnp.asarray(v["w_zero"])
                kernel = (w_int.astype(jnp.float32) + zero) * scale
                node = params_node.setdefault(k, {})
                node["kernel"] = kernel
                node["bias"] = jnp.asarray(v["bias"])
            else:
                walk(v, params_node.setdefault(k, {}))

    walk(deploy.get("packed", {}), params)
    out = {"params": params}
    for col in ("qparams", "batch_stats"):
        if col in deploy:
            out[col] = deploy[col]
    return out


def _deepcopy(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _deepcopy(v) for k, v in tree.items()}
    return tree


def model_size_bytes(variables: Dict[str, Any]) -> int:
    """Total bytes of all array leaves (reporting/packing-ratio checks)."""
    leaves = jax.tree.leaves(variables)
    return int(sum(np.asarray(l).nbytes for l in leaves))
