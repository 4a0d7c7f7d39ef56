"""High-level convenience API.

The reference exposes its workflow only through the CLI runner chain; here
the same steps are also one-call library functions (the pattern every test,
bench, and the driver entry repeat):

    import quantize_tpu as qt

    model = qt.MODELS.build("resnet50", num_classes=1000,
                            ctx=qt.QuantCtx(cfg_quant))
    variables = qt.init_model(model, sample_batch)
    variables = qt.calibrate_model(model, variables, calib_batches)
    logits = model.apply(variables, x, mode="quant")      # simulation
    deploy = qt.pack_model(model, variables, sample_batch)
    logits = model.apply(deploy, x, mode="packed")        # int8/int4 serving
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Optional


def init_model(model, sample_x, seed: int = 0,
               torch_state_dict: Optional[Dict[str, Any]] = None,
               model_name: Optional[str] = None,
               fold_bn: bool = True, into_scale: bool = False) -> Dict[str, Any]:
    """Initialize variables (calibrate-mode trace, taps dropped), optionally
    importing a torch checkpoint — with the observer reset that importing
    requires (see :func:`quantize_tpu.nn.quantizer.reset_observers`)."""
    import jax

    if isinstance(sample_x, dict):
        sample_x = sample_x["img"]  # loader batches, as in calibrate_model
    variables = dict(model.init(jax.random.PRNGKey(seed), sample_x,
                                mode="calibrate"))
    variables.pop("taps", None)
    if torch_state_dict is not None:
        from .models.import_auto import import_torch_checkpoint
        from .nn.quantizer import reset_observers

        if not model_name:
            raise ValueError(
                "init_model(torch_state_dict=...) needs model_name to pick "
                "the importer (see models/import_auto.py)")
        variables = import_torch_checkpoint(
            model_name, torch_state_dict, variables,
            fold_bn=fold_bn, into_scale=into_scale)
        variables = reset_observers(variables)
    return variables


def calibrate_model(model, variables: Dict[str, Any],
                    batches: Iterable) -> Dict[str, Any]:
    """Run observer calibration over ``batches`` (arrays or dicts with an
    ``'img'`` key), threading the mutable observer state — the reference's
    PTQ calibration epoch (``runner/ptq.py:51-68``) as a library call."""
    import jax.numpy as jnp

    for batch in batches:
        x = batch["img"] if isinstance(batch, dict) else batch
        _, upd = model.apply(variables, jnp.asarray(x), mode="calibrate",
                             mutable=["qobs", "qparams"])
        variables = {**variables, **upd}
    return variables
