"""QAT runner: calibration epochs, then STE fine-tuning through fake-quant.

Covers the reference ``QAT`` runner (``runner/qat.py:14``): epochs below
``calibrated_epoch`` delegate to PTQ calibration; at the switch an optimizer
is built over ALL parameters — weights *and* quantizer scale/zero, which are
``nn.Parameter``s in the reference (``quantizer.py:120-121``) — and training
proceeds with cross-entropy through the fake-quant graph (STE gradients).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..optim import build_optimizer
from .base import masked_topk_correct
from .ptq import PTQ

TRAINABLE = ("params", "qparams")


class QAT(PTQ):
    name = "qat"

    def __init__(self, cfg, *loaders):
        super().__init__(cfg, *loaders)
        self.calibrated_epoch = int(cfg.train.calibrated_epoch or 1)
        self.max_epoch += self.calibrated_epoch
        self.initialized = False
        self.opt_state = None
        self.tx = None

    def build_optim(self):
        steps = len(self.train_loader) if self.train_loader is not None else 1
        base = build_optimizer(self.cfg, steps_per_epoch=steps)
        # Optional update-scale for quantizer scale/zero: Adam's
        # magnitude-free updates can swamp tiny scales when training from
        # scratch (LSQ-style rescaling). Default 1.0 == reference behavior
        # (single optimizer over all parameters, runner/qat.py:43-49).
        qs = float(getattr(self.cfg.optimizer, "qparams_lr_scale", None) or 1.0)
        trainable = {c: self.variables[c] for c in TRAINABLE if c in self.variables}
        if qs != 1.0:
            import jax as _jax

            labels = {
                c: _jax.tree.map(lambda _: "qparams" if c == "qparams" else "main", tree)
                for c, tree in trainable.items()
            }
            qtx = optax.chain(build_optimizer(self.cfg, steps_per_epoch=steps),
                              optax.scale(qs))
            self.tx = optax.multi_transform({"main": base, "qparams": qtx}, labels)
        else:
            self.tx = base
        self.opt_state = self.tx.init(trainable)

    def _train_fn(self):
        fn = self._jit_cache.get("qat_train")
        if fn is None:
            model, tx = self.model, self.tx

            def _loss(trainable: Dict[str, Any], frozen: Dict[str, Any], img, label):
                variables = {**frozen, **trainable}
                logits = model.apply(variables, img, mode="quant")
                valid = label >= 0
                loss_vec = optax.softmax_cross_entropy_with_integer_labels(
                    logits, jnp.maximum(label, 0)
                )
                loss = jnp.sum(loss_vec * valid) / jnp.maximum(jnp.sum(valid), 1)
                return loss, logits

            def _step(variables, opt_state, img, label):
                trainable = {c: variables[c] for c in TRAINABLE if c in variables}
                frozen = {c: v for c, v in variables.items() if c not in TRAINABLE}
                (loss, logits), grads = jax.value_and_grad(_loss, has_aux=True)(
                    trainable, frozen, img, label
                )
                updates, opt_state = tx.update(grads, opt_state, trainable)
                trainable = optax.apply_updates(trainable, updates)
                c, t = masked_topk_correct(logits, label)
                return {**frozen, **trainable}, opt_state, loss, 100.0 * c / jnp.maximum(t, 1)

            fn = jax.jit(_step)
            self._jit_cache["qat_train"] = fn
        return fn

    def train_step(self, batch, epoch, it, total_iters):
        if not self.initialized:
            return super().train_step(batch, epoch, it, total_iters)
        self.variables, self.opt_state, loss, acc = self._train_fn()(
            self.variables, self.opt_state,
            jnp.asarray(batch["img"]), jnp.asarray(batch["label"]),
        )
        return float(loss), float(acc), len(batch["label"])

    def update(self, epoch):
        cfg = self.cfg
        if (epoch + 1) == self.calibrated_epoch:
            eval_result = self.evaluate(self.val_loader, quantized=True) if self.val_loader else None
            self.save_model(eval_result)
            self.build_optim()
            self.initialized = True
            return

        eval_result = None
        if (epoch + 1) == self.max_epoch:
            if self.val_loader is not None:
                eval_result = self.evaluate(self.val_loader, quantized=True)
            self.save_model(eval_result)
            return
        if cfg.train.eval_freq and (epoch + 1) % cfg.train.eval_freq == 0:
            eval_result = self.evaluate(self.val_loader, quantized=True)
        if cfg.train.save_freq and (epoch + 1) % cfg.train.save_freq == 0:
            self.save_model(eval_result)
