"""PTQ runner: one calibration epoch, then quantized evaluation.

Covers the reference ``PTQ`` runner (``runner/ptq.py:15``): each train step
runs the model in calibrate mode (observers update, output stays FP32 —
``runner/ptq.py:51-63`` sets calibrating=True, quantized=False), end of
epoch evaluates with fake-quant enabled and saves the best checkpoint.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .base import BasicRunner, masked_topk_correct


class PTQ(BasicRunner):
    name = "ptq"

    def _calibrate_fn(self):
        fn = self._jit_cache.get("calibrate")
        if fn is None:
            model = self.model

            def _cal(variables, img, label):
                logits, updates = model.apply(
                    variables, img, mode="calibrate", mutable=["qobs", "qparams"]
                )
                valid = label >= 0
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, jnp.maximum(label, 0)
                )
                loss = jnp.sum(loss * valid) / jnp.maximum(jnp.sum(valid), 1)
                c, t = masked_topk_correct(logits, label)
                return updates, loss, 100.0 * c / jnp.maximum(t, 1)

            fn = jax.jit(_cal)
            self._jit_cache["calibrate"] = fn
        return fn

    def train_step(self, batch, epoch, it, total_iters):
        updates, loss, acc = self._calibrate_fn()(
            self.variables, jnp.asarray(batch["img"]), jnp.asarray(batch["label"])
        )
        self.merge_updates(updates)
        return float(loss), float(acc), len(batch["label"])

    def update(self, epoch):
        cfg = self.cfg
        eval_result = None
        if cfg.train.eval_freq and (epoch + 1) % cfg.train.eval_freq == 0:
            eval_result = self.evaluate(self.val_loader, quantized=True)
        if cfg.train.save_freq and (epoch + 1) % cfg.train.save_freq == 0:
            self.save_model(eval_result)
        if (epoch + 1) == self.max_epoch:
            if self.val_loader is not None:
                eval_result = self.evaluate(self.val_loader, quantized=True)
            self.save_model(eval_result)
