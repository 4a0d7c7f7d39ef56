"""AdaRound runner: layer-wise rounding reconstruction.

Covers the reference ``AdaRound`` runner (``runner/adaround.py:14``):

* lazy init — one calibrated + quantized forward instantiates the per-layer
  ``V`` offsets (``runner/adaround.py:125-129``), then an optimizer is built
  over ONLY those (``:44-72``);
* each step runs two forwards — FP32 (with calibration still active,
  reference sets calibrating=True for the original pass) capturing every
  quant layer's output, then quantized capturing the same taps
  (``:131-143``) — the forward hooks become the ``taps`` sow collection;
* loss = Σ_layers MSE(quant, fp32) + Σ β-weighted rounding regularization
  with β linearly annealed 20→2 after 20% warmup (``:103-119,145-159``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..optim import build_optimizer
from ..quant.adaround import beta_schedule, regularization
from .base import masked_topk_correct
from .ptq import PTQ


class AdaRound(PTQ):
    name = "adaround"

    def __init__(self, cfg, *loaders):
        super().__init__(cfg, *loaders)
        self.initialized = False
        self.opt_state = None
        self.tx = None

    def _init_adaround(self, batch):
        img = jnp.asarray(batch["img"])
        # calibrate scales first (the reference's first forward runs with
        # calibrating=True AND quantized=True)
        _, upd = self.model.apply(
            self.variables, img, mode="calibrate", mutable=["qobs", "qparams"]
        )
        self.merge_updates(upd)
        _, upd = self.model.apply(
            self.variables, img, mode="init_adaround", mutable=["adaround"]
        )
        self.merge_updates(upd)
        if "adaround" not in self.variables or not jax.tree.leaves(self.variables["adaround"]):
            raise ValueError(
                "AdaRound runner needs quantizers with `adaround` enabled in "
                "their weight config (quant.default.weight.adaround.apply=true)"
            )
        steps = len(self.train_loader) if self.train_loader is not None else 1
        self.tx = build_optimizer(self.cfg, steps_per_epoch=steps)
        self.opt_state = self.tx.init(self.variables["adaround"])
        self.initialized = True

    def _train_fn(self):
        fn = self._jit_cache.get("ada_train")
        if fn is None:
            model, tx = self.model, self.tx

            def _step(variables, opt_state, img, label, beta):
                # pass 1: FP32 forward with calibration, capture taps
                _, upd = model.apply(
                    variables, img, mode="calibrate",
                    mutable=["qobs", "qparams", "taps"],
                )
                fp_taps = jax.lax.stop_gradient(upd.pop("taps"))
                variables = {**variables, "qobs": upd["qobs"], "qparams": upd["qparams"]}

                def loss_fn(ada):
                    vars2 = {**variables, "adaround": ada}
                    logits, upd2 = model.apply(vars2, img, mode="quant", mutable=["taps"])
                    q_taps = upd2["taps"]
                    recon_terms = jax.tree.map(
                        lambda q, o: jnp.mean((q - o) ** 2), q_taps, fp_taps
                    )
                    recon = sum(jax.tree.leaves(recon_terms))
                    reg = sum(
                        regularization(v, beta) for v in jax.tree.leaves(ada)
                    )
                    return recon + reg, logits

                (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    variables["adaround"]
                )
                updates, opt_state = tx.update(grads, opt_state, variables["adaround"])
                ada = optax.apply_updates(variables["adaround"], updates)
                c, t = masked_topk_correct(logits, label)
                acc = 100.0 * c / jnp.maximum(t, 1)
                return {**variables, "adaround": ada}, opt_state, loss, acc

            fn = jax.jit(_step)
            self._jit_cache["ada_train"] = fn
        return fn

    def _beta(self, it: int, total_iters: int) -> float:
        beta_cfg = self.cfg.runner.beta if self.cfg.runner else None
        if beta_cfg is None or beta_cfg == "dynamic":
            return float(beta_schedule(it, total_iters))
        return float(beta_cfg)

    def train_step(self, batch, epoch, it, total_iters):
        if not self.initialized:
            self._init_adaround(batch)
        beta = self._beta(it, total_iters)
        self.variables, self.opt_state, loss, acc = self._train_fn()(
            self.variables, self.opt_state,
            jnp.asarray(batch["img"]), jnp.asarray(batch["label"]),
            jnp.asarray(beta, jnp.float32),
        )
        return float(loss), float(acc), len(batch["label"])
