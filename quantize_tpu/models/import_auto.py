"""Model-name -> torch-checkpoint importer dispatch.

Wires ``cfg.model.torch_checkpoint`` (a user-provided ``.pth`` / ``.pt``
state dict; this environment has no download egress) to the right converter,
playing the role of the reference's pretrained-weight loading inside
``build_model`` (``modelzoo/load.py:12`` + per-family loaders).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

from .import_clip import import_clip
from .import_mobilenet import (import_mobilenet_v1, import_mobilenet_v2,
                               import_mobilenet_v3)
from .import_resnet import import_resnet
from .import_vit import import_vit
from .import_wideresnet import import_wideresnet

_VIT_LAYERS = {"vit_b_16": 12, "vit_b_32": 12, "vit_l_16": 24,
               "vit_l_32": 24, "vit_h_14": 32}


def _importer_for(model_name: str) -> Callable[..., Dict[str, Any]]:
    name = model_name.lower()
    if name in _VIT_LAYERS:
        return lambda sd, v, **_kw: import_vit(sd, v, num_layers=_VIT_LAYERS[name])
    if name.startswith("clip_"):
        return lambda sd, v, fold_bn=True, **_kw: import_clip(sd, v, fold_bn=fold_bn)
    if name == "mobilenet_v1":
        return import_mobilenet_v1
    if name == "mobilenet_v2":
        return import_mobilenet_v2
    if name.startswith("mobilenet_v3"):
        small = name.endswith("small")
        return lambda sd, v, **kw: import_mobilenet_v3(sd, v, small=small, **kw)
    if name.startswith("wideresnet") or name.startswith("rb_wrn"):
        depth = 28
        if name.startswith("wideresnet"):
            depth = int(name.replace("wideresnet", "") or 28)
        return lambda sd, v, **kw: import_wideresnet(sd, v, depth=depth, **kw)
    if "resnet" in name or "resnext" in name:
        return import_resnet
    raise KeyError(f"no torch-checkpoint importer for model {model_name!r}")


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a .pth/.pt file into a flat numpy state dict (torch is CPU-only
    in this environment, which is all the conversion needs)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k.removeprefix("module."): v for k, v in obj.items()}


def import_torch_checkpoint(
    model_name: str,
    state_dict: Dict[str, Any],
    variables: Dict[str, Any],
    fold_bn: bool = True,
    into_scale: bool = False,
) -> Dict[str, Any]:
    """Convert ``state_dict`` into ``variables`` for ``model_name``."""
    fn = _importer_for(model_name)
    return fn(state_dict, variables, fold_bn=fold_bn, into_scale=into_scale)
