"""Import torch/torchvision checkpoints into this framework's param trees.

The reference consumes pretrained torchvision weights directly; with no
network egress this framework instead converts user-provided torch
``state_dict``s (``.pth`` files or in-memory dicts). Conversion includes the
BN-folding transform the reference performs during surgery
(``modelzoo/modules/quantconv2d.py:115-133``):

* bias  ← bn_bias + (conv_bias − running_mean) · γ / √(var + eps)
* weight← W · γ/√(var+eps)   (per out-channel), or, with ``into_scale``,
  the multiplier is returned separately to install as the weight-quantizer
  ``static_scale`` instead of touching the weight data.

Layout changes: conv OIHW → HWIO, linear (out, in) → (in, out).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def conv_torch_to_hwio(w: Any) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def linear_torch_to_io(w: Any) -> np.ndarray:
    return _np(w).T  # (out, in) -> (in, out)


def fold_bn(
    conv_w_oihw: Any,
    conv_b: Optional[Any],
    bn_gamma: Any,
    bn_beta: Any,
    running_mean: Any,
    running_var: Any,
    eps: float = 1e-5,
    into_scale: bool = False,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Fold a BatchNorm into the preceding conv.

    Returns (weight_oihw, bias, static_scale) — ``static_scale`` is None
    unless ``into_scale``, in which case the weight is left unscaled and the
    multiplier is returned for the quantizer.
    """
    w = _np(conv_w_oihw)
    gamma, beta = _np(bn_gamma), _np(bn_beta)
    mean, var = _np(running_mean), _np(running_var)
    b = _np(conv_b) if conv_b is not None else np.zeros(w.shape[0], np.float32)

    mult = gamma / np.sqrt(var + eps)
    bias = beta + (b - mean) * mult
    if into_scale:
        return w, bias, mult
    return w * mult.reshape(-1, 1, 1, 1), bias, None


class StateDict:
    """Thin cursor over a torch state_dict with key-prefix navigation."""

    def __init__(self, sd: Mapping[str, Any], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix

    def sub(self, name: str) -> "StateDict":
        p = f"{self.prefix}{name}."
        return StateDict(self.sd, p)

    def __getitem__(self, key: str) -> Any:
        return self.sd[self.prefix + key]

    def get(self, key: str, default=None) -> Any:
        return self.sd.get(self.prefix + key, default)

    def __contains__(self, key: str) -> bool:
        return (self.prefix + key) in self.sd


def import_conv_bn(
    sd: StateDict,
    conv_key: str,
    bn_key: Optional[str],
    fold: bool,
    into_scale: bool = False,
) -> Dict[str, Any]:
    """Produce the param dict (and optional quantizer static_scale) for one
    QuantConv site from torch ``conv_key``/``bn_key`` entries.

    Returns a dict with 'kernel' (HWIO), optional 'bias', and optional
    '_static_scale' (caller installs into qparams) / '_bn' (unfolded BN
    params for a separate BatchNorm module).
    """
    w = sd[f"{conv_key}.weight"]
    b = sd.get(f"{conv_key}.bias")
    out: Dict[str, Any] = {}
    if bn_key is not None and fold:
        w_f, bias, ss = fold_bn(
            w, b,
            sd[f"{bn_key}.weight"], sd[f"{bn_key}.bias"],
            sd[f"{bn_key}.running_mean"], sd[f"{bn_key}.running_var"],
            into_scale=into_scale,
        )
        out["kernel"] = w_f.transpose(2, 3, 1, 0)
        out["bias"] = bias
        if ss is not None:
            out["_static_scale"] = ss
    else:
        out["kernel"] = conv_torch_to_hwio(w)
        if b is not None:
            out["bias"] = _np(b)
        if bn_key is not None:
            out["_bn"] = {
                "scale": _np(sd[f"{bn_key}.weight"]),
                "bias": _np(sd[f"{bn_key}.bias"]),
                "mean": _np(sd[f"{bn_key}.running_mean"]),
                "var": _np(sd[f"{bn_key}.running_var"]),
            }
    return out


def import_linear(sd: StateDict, key: str) -> Dict[str, Any]:
    out = {"kernel": linear_torch_to_io(sd[f"{key}.weight"])}
    b = sd.get(f"{key}.bias")
    if b is not None:
        out["bias"] = _np(b)
    return out
