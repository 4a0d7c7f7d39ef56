"""AdaRound runner: layer-wise rounding reconstruction.

Covers the reference ``AdaRound`` runner (``runner/adaround.py:14``):

* lazy init — one calibrated + quantized forward instantiates the per-layer
  ``V`` offsets (``runner/adaround.py:125-129``), then an optimizer is built
  over ONLY those (``:44-72``);
* loss = MSE(quant layer out, FP32 layer out) + β-weighted rounding
  regularization with β linearly annealed 20→2 after 20% warmup
  (``:103-119,145-159``).

Two reconstruction modes (``cfg.runner.reconstruction``):

* ``'blockwise'`` (default) — per-layer replay: ONE tap-capture pass per
  batch caches every quant layer's (input, FP32 output) on the host (the
  reference's ``.detach().cpu()`` offload, ``runner/adaround.py:131-136``),
  then each layer's ``V`` is optimized alone against its cached pairs.
  Device memory is one layer's tensors — constant in network depth, so
  MobileNetV2 @ 224² fits a single chip's HBM.
* ``'sequential'`` — blockwise memory layout with the REFERENCE's dataflow
  (``runner/adaround.py:138-143``): layer L's inputs are recomputed through
  the already-reconstructed quantized prefix (layers < L carry their final
  ``V``), not captured from the FP32 pass. Targets stay the FP32 outputs.
  One extra quantized forward per (layer, batch); device memory still one
  layer's optimization at a time.
* ``'joint'`` — the reference's literal two-forwards-per-step scheme (FP32
  + quantized in one jit, loss summed over all layers). Keeps full
  cross-layer gradients but holds every tap for both passes plus the
  backward in HBM at once.

Host-cache bound: phase 1 keeps every layer's (input, FP32 output) per
cached batch in host RAM. ``cfg.runner.max_cached_batches`` caps how many
batches are cached (reconstruction then loops over the cached subset) —
at the reference's 16-shot calibration scale the cache is tiny, but the cap
makes large-loader configs safe.
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..optim import build_optimizer
from ..quant.adaround import beta_schedule, regularization
from .base import masked_topk_correct, pad_batch
from .ptq import PTQ


def _tree_get(tree, path: Tuple[str, ...]):
    for p in path:
        if tree is None or p not in tree:
            return None
        tree = tree[p]
    return tree


def _tree_set(tree: dict, path: Tuple[str, ...], value) -> dict:
    """Return a copy of ``tree`` with ``value`` installed at ``path``."""
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _tree_set(dict(out.get(path[0], {})), path[1:], value)
    return out


class AdaRound(PTQ):
    name = "adaround"

    def __init__(self, cfg, *loaders):
        super().__init__(cfg, *loaders)
        self.initialized = False
        self.opt_state = None
        self.tx = None

    def _reconstruction(self) -> str:
        mode = (self.cfg.runner.reconstruction if self.cfg.runner else None) or "blockwise"
        assert mode in ("blockwise", "sequential", "joint"), mode
        return mode

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

    # -- block-wise reconstruction -----------------------------------------
    def _collect_layer_clones(self, img) -> Dict[Tuple[str, ...], object]:
        """Map module path -> unbound clone for every quant layer that owns
        AdaRound V offsets. Uses a zero-FLOP abstract trace
        (``jax.eval_shape``) with a method interceptor, so no layer-specific
        model knowledge is needed."""
        import flax.linen as fnn

        from ..nn.layers import QuantConv, QuantDense

        clones: Dict[Tuple[str, ...], object] = {}

        def _hashable_overrides(mod):
            """Tuple-ize list-valued attrs (padding etc.) so the clone is
            hashable as a static jit argument."""
            out = {}
            for f in ("padding", "strides", "kernel_size", "kernel_dilation",
                      "window"):
                v = getattr(mod, f, None)
                if isinstance(v, list):
                    out[f] = tuple(tuple(x) if isinstance(x, list) else x
                                   for x in v)
            return out

        def interceptor(next_fn, args, kwargs, context):
            mod = context.module
            if (context.method_name == "__call__"
                    and isinstance(mod, (QuantConv, QuantDense))):
                # name-normalized clone: module dataclasses hash by value,
                # so layers with identical configs+shapes become the SAME
                # static jit argument and share one compiled graph (the
                # original name would make every layer a distinct static).
                # Applied standalone, the name never enters variable paths.
                clones.setdefault(
                    tuple(mod.path),
                    mod.clone(parent=None, name="ada_layer",
                              **_hashable_overrides(mod)))
            return next_fn(*args, **kwargs)

        with fnn.intercept_methods(interceptor):
            jax.eval_shape(
                lambda v, x: self.model.apply(v, x, mode="quant"),
                self.variables, img,
            )
        ada = self.variables.get("adaround", {})
        return {p: c for p, c in clones.items()
                if _tree_get(ada, p + ("w_quantizer", "V")) is not None}

    def _layer_vars(self, path: Tuple[str, ...]) -> Dict[str, dict]:
        lv = {}
        for col in ("params", "qparams", "qobs", "adaround"):
            sub = _tree_get(self.variables.get(col), path)
            if sub is not None:
                lv[col] = sub
        return lv

    def _blockwise_layer_step(self, tx):
        """Per-step fallback (layer cache too big to stack on device). The
        clone is a STATIC jit argument: name-normalized clones hash by
        value, so every layer with the same config+shapes reuses one
        compiled graph — at MobileNetV2 scale this collapses the 53
        per-layer cold compiles to one per distinct layer signature
        (r4 VERDICT item 6)."""
        import functools

        @functools.partial(jax.jit, static_argnums=0)
        def step(clone, lv, opt_state, x_in, y_fp, beta):
            def loss_fn(ada):
                y = clone.apply({**lv, "adaround": ada}, x_in, mode="quant")
                recon = jnp.mean((y - y_fp) ** 2)
                reg = sum(regularization(v, beta) for v in jax.tree.leaves(ada))
                return recon + reg

            loss, grads = jax.value_and_grad(loss_fn)(lv["adaround"])
            updates, opt_state = tx.update(grads, opt_state, lv["adaround"])
            ada = optax.apply_updates(lv["adaround"], updates)
            return ada, opt_state, loss

        return step

    def _blockwise_layer_scan(self, tx):
        """Whole-layer optimization as ONE dispatch: ``lax.scan`` over all
        (epoch x batch) steps with the cached pairs resident on device.

        The per-step python loop pays the host dispatch overhead (~25-30 ms
        on the remote-execution runtime) per (layer, batch, epoch) — it
        dominated the measured MobileNetV2 W4 blockwise wall time (docs/
        BENCH_NOTES.md round 4). Used whenever a layer's stacked cache fits
        the ``QTPU_ADAROUND_SCAN_MB`` budget (default 2048). The clone is a
        STATIC jit argument so identical layer signatures share ONE cold
        compile (see ``_blockwise_layer_step``)."""
        import functools

        @functools.partial(jax.jit, static_argnums=0)
        def run_scan(clone, lv, opt_state, xs, ys, betas):
            k = xs.shape[0]

            def body(carry, inp):
                ada, opt = carry
                i, beta = inp

                def loss_fn(a):
                    out = clone.apply({**lv, "adaround": a}, xs[i],
                                      mode="quant")
                    recon = jnp.mean((out - ys[i]) ** 2)
                    reg = sum(regularization(v, beta)
                              for v in jax.tree.leaves(a))
                    return recon + reg

                loss, grads = jax.value_and_grad(loss_fn)(ada)
                updates, opt = tx.update(grads, opt, ada)
                return (optax.apply_updates(ada, updates), opt), loss

            n = betas.shape[0]
            (ada, opt_state), losses = jax.lax.scan(
                body, (lv["adaround"], opt_state),
                (jnp.arange(n) % k, betas))
            return ada, opt_state, losses[-1]

        return run_scan

    def run(self) -> None:
        if self._reconstruction() == "joint":
            return super().run()
        assert self.train_loader is not None, "AdaRound needs a train loader"
        bs = self.train_loader.batch_size
        first = pad_batch(next(iter(self.train_loader)), bs)
        self.init_variables(first, seed=self.cfg.seed or 0)

        # PTQ pre-pass: full calibration epoch before reconstruction
        cal = self._calibrate_fn()
        for batch in self._prefetch(self.train_loader):
            updates, _, _ = cal(self.variables, jnp.asarray(batch["img"]),
                                jnp.asarray(batch["label"]))
            self.merge_updates(updates)
        self._init_adaround(first)

        img0 = jnp.asarray(first["img"])
        clones = self._collect_layer_clones(img0)
        self.logger.info(
            f"adaround blockwise: {len(clones)} layers to reconstruct")

        # phase 1: ONE tap-capture pass per batch; (input, fp32 out) pairs
        # offloaded to host (reference runner/adaround.py:131-136).
        # ``runner.max_cached_batches`` bounds the host cache.
        model = self.model
        sequential = self._reconstruction() == "sequential"
        max_cached = (self.cfg.runner.max_cached_batches
                      if self.cfg.runner else None)

        def _cap(variables, img):
            _, upd = model.apply(variables, img, mode="tap_io", mutable=["taps"])
            return upd["taps"]

        cap = jax.jit(_cap)
        caches: List[dict] = []
        imgs: List[np.ndarray] = []
        for batch in self._prefetch(self.train_loader):
            if max_cached and len(caches) >= int(max_cached):
                self.logger.info(
                    f"adaround: host cache capped at {max_cached} batches "
                    "(runner.max_cached_batches); reconstruction loops over "
                    "the cached subset")
                break
            caches.append(jax.device_get(cap(self.variables, jnp.asarray(batch["img"]))))
            if sequential:
                imgs.append(np.asarray(batch["img"]))

        # sequential dataflow: recompute layer L's inputs through the
        # already-reconstructed quantized prefix (reference
        # runner/adaround.py:138-143). The jit returns ONLY the requested
        # layer's input leaf (path is static), so XLA prunes every other
        # tap output — device memory stays one layer's input at a time,
        # matching the module docstring's claim for this mode too.
        def _cap_quant(variables, img, path):
            _, upd = model.apply(variables, img, mode="tap_io_quant",
                                 mutable=["taps"])
            return _tree_get(upd["taps"], path)["in"][0]

        cap_quant = jax.jit(_cap_quant, static_argnums=2)

        # phase 2: per-layer V optimization against the cached pairs —
        # device memory is one layer at a time, constant in depth. One
        # optimizer + one pair of jitted fns serve every layer (the clone
        # rides as a static jit arg), so layers sharing a signature share
        # their compiled graphs.
        steps_total = self.max_epoch * max(len(caches), 1)
        tx = build_optimizer(self.cfg, steps_per_epoch=max(len(caches), 1))
        run_scan = self._blockwise_layer_scan(tx)
        step_fn = self._blockwise_layer_step(tx)
        for li, (path, clone) in enumerate(clones.items()):
            tap = _tree_get(caches[0], path)
            if tap is None:
                continue
            x_ins = None
            if sequential:
                x_ins = [
                    np.asarray(jax.device_get(
                        cap_quant(self.variables, jnp.asarray(im), path)))
                    for im in imgs
                ]
            lv = self._layer_vars(path)
            ada = lv["adaround"]
            opt_state = tx.init(ada)
            betas = np.asarray([self._beta(i, steps_total)
                                for i in range(steps_total)], np.float32)

            def x_of(bi):
                return (x_ins[bi] if x_ins is not None
                        else np.asarray(_tree_get(caches[bi], path)["in"][0]))

            def y_of(bi):
                return np.asarray(_tree_get(caches[bi], path)["out"][0])

            # size the stacked cache from ONE batch's shapes before
            # materializing anything: the oversized case must not pay a
            # second full host copy just to discover it needs the fallback
            per_batch = x_of(0).nbytes + y_of(0).nbytes
            scan_cap = float(os.environ.get("QTPU_ADAROUND_SCAN_MB", 2048))
            if per_batch * len(caches) <= scan_cap * 1e6:
                ada, opt_state, loss = run_scan(
                    clone, lv, opt_state,
                    jnp.asarray(np.stack([x_of(b) for b in range(len(caches))])),
                    jnp.asarray(np.stack([y_of(b) for b in range(len(caches))])),
                    jnp.asarray(betas))
            else:
                # layer cache too big to stack on device: per-step dispatch
                loss = jnp.float32(0.0)
                for it in range(steps_total):
                    bi = it % len(caches)
                    ada, opt_state, loss = step_fn(
                        clone, lv, opt_state, jnp.asarray(x_of(bi)),
                        jnp.asarray(y_of(bi)),
                        jnp.asarray(betas[it], jnp.float32))
                    lv = {**lv, "adaround": ada}
            # ada is the layer-local adaround subtree; install it wholesale
            self.variables = {
                **self.variables,
                "adaround": _tree_set(dict(self.variables["adaround"]), path, ada),
            }
            self.logger.info(
                f"adaround layer [{li + 1}/{len(clones)}] "
                f"{'/'.join(path)}: loss {float(loss):.6f}")
        self.update(self.max_epoch - 1)
