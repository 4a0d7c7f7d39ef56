"""Runner base: training/eval loops, meters, checkpointing.

Covers the reference ``BasicRunner`` (``runner/base.py:14``): epoch loop with
loss/acc meters and ETA logging, evaluation with top-1, checkpoint
save/load with best-model tracking recorded into ``cfg.runner.best``
(``runner/base.py:211-291``). Checkpoints serialize the full variables
pytree (params + qparams + observer state + adaround) with flax msgpack.
"""
from __future__ import annotations

import os
import pickle
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..models import build_model
from ..nn.intercept import QuantCtx
from ..utils import AverageMeter, MovingAverageMeter, get_logger


def pad_batch(batch: Dict[str, np.ndarray], batch_size: int) -> Dict[str, np.ndarray]:
    """Pad a trailing batch to the full batch size (labels padded with -1 so
    accuracy masks them out) — keeps jit shapes static."""
    n = len(batch["label"])
    if n == batch_size:
        return batch
    pad_n = batch_size - n
    img = np.concatenate([batch["img"], np.zeros((pad_n, *batch["img"].shape[1:]), batch["img"].dtype)])
    label = np.concatenate([batch["label"], np.full((pad_n,), -1, batch["label"].dtype)])
    return {"img": img, "label": label}


def masked_topk_correct(logits: jnp.ndarray, labels: jnp.ndarray, k: int = 1):
    """(#correct, #valid) with label -1 = padding."""
    valid = labels >= 0
    topk = jnp.argsort(-logits, axis=-1)[:, :k]
    correct = jnp.any(topk == labels[:, None], axis=-1) & valid
    return jnp.sum(correct), jnp.sum(valid)


class BasicRunner:
    """Base runner: owns the model, its variables, and the loaders."""

    name = "base"

    def __init__(self, cfg, train_loader=None, val_loader=None, test_loader=None):
        self.cfg = cfg
        self.logger = get_logger()
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.test_loader = test_loader

        self.max_epoch = int(cfg.train.max_epoch or 1) if cfg.train else 1
        self.print_freq = int(cfg.train.print_freq or 10) if cfg.train else 10

        self.ctx = QuantCtx(cfg.quant) if cfg.quant else QuantCtx.fp32()
        self.model = build_model(cfg.model, ctx=self.ctx)
        self.variables: Dict[str, Any] = {}
        self._jit_cache: Dict[str, Any] = {}

        if cfg.model and cfg.model.checkpoint:
            self.load_checkpoint(cfg.model.checkpoint)

    # -- variables --------------------------------------------------------
    def init_variables(self, sample_batch: Dict[str, np.ndarray], seed: int = 0) -> None:
        if self.variables:
            return
        x = jnp.asarray(sample_batch["img"])
        variables = dict(self.model.init(jax.random.PRNGKey(seed), x, mode="calibrate"))
        variables.pop("taps", None)
        self.variables = variables
        self._maybe_import_torch_checkpoint()
        self._maybe_precompute_zeroshot()

    def _maybe_import_torch_checkpoint(self) -> None:
        """``cfg.model.torch_checkpoint``: convert a user-provided torch
        ``.pth`` into the initialized variables (the reference's
        pretrained-weight loading, ``modelzoo/load.py:12``; BN fold per
        ``quantconv2d.py:115-133``)."""
        path = self.cfg.model.torch_checkpoint if self.cfg.model else None
        if not path:
            return
        from ..models.import_auto import (import_torch_checkpoint,
                                          load_torch_state_dict)

        fold = bool(self.ctx.bn_folding_enabled)
        bnf = self.ctx.default.get("bn_folding")
        into_scale = False
        if bnf is not None and not isinstance(bnf, bool):
            into_scale = bool(dict(bnf).get("into_scale"))
        self.logger.info(f"importing torch checkpoint {path} "
                         f"(fold_bn={fold}, into_scale={into_scale})")
        expected = getattr(self.cfg.model, "torch_checkpoint_sha256", None)
        if expected:
            from ..models.manifest import verify_checkpoint

            verify_checkpoint(str(path), str(expected),
                              model_name=str(self.cfg.model.name))
        sd = load_torch_state_dict(path)
        self.variables = import_torch_checkpoint(
            str(self.cfg.model.name), sd, self.variables,
            fold_bn=fold, into_scale=into_scale)
        # init ran a calibrate trace on the RANDOM init weights; restart
        # every observer so calibration sees only the imported weights
        from ..nn.quantizer import reset_observers

        self.variables = reset_observers(self.variables)

    def _maybe_precompute_zeroshot(self) -> None:
        """CLIP zero-shot weights: one-time text-tower pass over class
        prompts (reference ``CLIPModel.zeroshot_classifier``,
        ``modelzoo/clip/__init__.py:38-51``)."""
        from ..models.clip import CLIPZeroShot, build_zeroshot

        if not isinstance(self.model, CLIPZeroShot):
            return
        classnames = list(self.cfg.model.classnames or [])
        if not classnames:
            classnames = [str(i) for i in range(self.model.num_classes)]
        prompts = list(self.cfg.model.prompts or [])
        self.logger.info(f"precomputing CLIP zero-shot weights for {len(classnames)} classes")
        self.variables = build_zeroshot(self.model, self.variables, classnames,
                                        prompts or None)

    def merge_updates(self, updates: Dict[str, Any]) -> None:
        merged = dict(self.variables)
        for col, tree in updates.items():
            if col != "taps":
                merged[col] = tree
        self.variables = merged

    # -- steps (overridden by subclasses) ---------------------------------
    def train_step(self, batch, epoch: int, it: int, total_iters: int):
        raise NotImplementedError

    def eval_step(self, batch, quantized: bool = False):
        mode = "quant" if quantized else "fp32"
        fn = self._jit_cache.get(f"eval_{mode}")
        if fn is None:
            model = self.model

            def _eval(variables, img):
                return model.apply(variables, img, mode=mode)

            fn = jax.jit(_eval)
            self._jit_cache[f"eval_{mode}"] = fn
        return fn(self.variables, jnp.asarray(batch["img"]))

    # -- loops ------------------------------------------------------------
    def _prefetch(self, loader, prefetch: int = 2):
        """Iterate ``loader`` with padding + background host->device
        prefetch, so host IO overlaps device compute
        (:mod:`quantize_tpu.parallel.input_pipeline`)."""
        from ..parallel.input_pipeline import PrefetchIterator

        bs = loader.batch_size

        def gen():
            for batch in loader:
                yield pad_batch(batch, bs)

        return PrefetchIterator(gen(), mesh=getattr(self, "mesh", None),
                                prefetch=prefetch)

    def run(self) -> None:
        """Train loop (reference ``runner/base.py:108-147``)."""
        assert self.train_loader is not None, "runner.run() needs a train loader"
        first = next(iter(self.train_loader))
        self.init_variables(pad_batch(first, self.train_loader.batch_size), seed=self.cfg.seed or 0)
        self.total_iters = self.max_epoch * len(self.train_loader)

        it = 0
        for epoch in range(self.max_epoch):
            loss_m, acc_m = MovingAverageMeter(), MovingAverageMeter()
            t0 = time.time()
            for bi, batch in enumerate(self._prefetch(self.train_loader)):
                loss, acc, n = self.train_step(batch, epoch, it, self.total_iters)
                loss_m.update(loss)
                acc_m.update(acc)
                it += 1
                if (bi + 1) % self.print_freq == 0:
                    done = epoch * len(self.train_loader) + bi + 1
                    eta = (time.time() - t0) / (bi + 1) * (self.total_iters - done)
                    self.logger.info(
                        f"epoch [{epoch + 1}/{self.max_epoch}] iter [{bi + 1}/{len(self.train_loader)}] "
                        f"loss {loss_m.avg:.4f} acc {acc_m.avg:.2f} eta {eta:.0f}s"
                    )
            self.update(epoch)

    def update(self, epoch: int) -> None:
        """End-of-epoch hook."""

    def evaluate(self, loader, quantized: bool = False) -> Dict[str, float]:
        """Eval loop (reference ``runner/base.py:149-191``)."""
        assert loader is not None
        correct = total = 0
        loss_sum = 0.0
        for batch in self._prefetch(loader):
            logits = self.eval_step(batch, quantized=quantized)
            labels = jnp.asarray(batch["label"])
            c, t = masked_topk_correct(logits, labels)
            correct += int(c)
            total += int(t)
        top1 = 100.0 * correct / max(total, 1)
        result = {"top1": top1, "n": total}
        self.logger.info(f"eval: top1 {top1:.2f}% over {total} examples (quantized={quantized})")
        return result

    # -- checkpointing ----------------------------------------------------
    def save_checkpoint(self, path: str, extra: Optional[Dict[str, Any]] = None) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "variables": serialization.to_bytes(jax.device_get(self.variables)),
            "extra": extra or {},
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        self.logger.info(f"checkpoint saved to {path}")

    def load_checkpoint(self, path: str) -> Dict[str, Any]:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if self.variables:
            self.variables = serialization.from_bytes(self.variables, payload["variables"])
        else:
            # structure-free restore: msgpack to nested dict of arrays
            self.variables = serialization.msgpack_restore(payload["variables"])
        self.logger.info(f"checkpoint loaded from {path}")
        return payload.get("extra", {})

    def save_model(self, eval_result: Optional[Dict[str, float]] = None) -> None:
        """Best-model tracking (reference ``runner/base.py:252-283``)."""
        out_dir = self.cfg.output_dir or "results"
        path = os.path.join(out_dir, "ckpt_last.pkl")
        self.save_checkpoint(path, extra={"eval": eval_result})
        if eval_result is not None:
            best = getattr(self, "_best_acc", -1.0)
            if eval_result.get("top1", -1.0) > best:
                self._best_acc = eval_result["top1"]
                best_path = os.path.join(out_dir, "ckpt_best.pkl")
                self.save_checkpoint(best_path, extra={"eval": eval_result})
                if self.cfg.runner:
                    self.cfg.runner.best = best_path
