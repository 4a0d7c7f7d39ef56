"""Training-path TPU benchmarks (VERDICT r3 item 4; BASELINE configs [2,3]
are training configs but the reference published accuracy only — the
throughput baseline here is the same model's non-quantized f32 training
step, whose matmuls the TPU already executes at bf16 precision by
default).

Two modes (BENCH_TRAIN=qat|adaround):

* qat — ViT-B/16 W4A8 QAT step (the exact jitted step the QAT runner
  compiles: CE loss through the fake-quant graph, adam over params+qparams)
  vs the same step with quantization off (f32 dtypes; JAX's default TPU
  matmul precision already runs these as single-pass bf16 MXU ops — see
  docs/BENCH_NOTES.md round-4 precision note). Batch from BENCH_BATCH
  (config default 128), synthetic on-device batches, chained timing with a
  hard value fetch per iteration (see bench.py::_time).
* adaround — MobileNetV2 W4 blockwise reconstruction: wall time of the
  per-layer optimization phase, per-layer dispatch count, and the scan-vs-
  python-loop comparison (QTPU_ADAROUND_SCAN_MB=0 forces the loop).

Prints one JSON line per measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk_cfg(wbits: int) -> dict:
    return {"default": {
        "weight": {"n_bits": wbits, "symmetric": True, "signed": True,
                   "granularity": "channel", "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "maminmax", "momentum": 0.1}},
        "bn_folding": True}}


def bench_qat() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from quantize_tpu.models import MODELS
    from quantize_tpu.nn.intercept import QuantCtx

    batch = int(os.environ.get("BENCH_BATCH", 128))
    size = int(os.environ.get("BENCH_SIZE", 224))
    iters = int(os.environ.get("BENCH_ITERS", 5))
    model_name = os.environ.get("BENCH_MODEL", "vit_b_16")
    wbits = int(os.environ.get("BENCH_WBITS", 4))

    def build(ctx):
        model = MODELS.build(model_name, num_classes=1000, ctx=ctx)
        x0 = jnp.zeros((batch, size, size, 3), jnp.float32)
        v = dict(model.init(jax.random.PRNGKey(0), x0[:2], mode="calibrate"))
        v.pop("taps", None)
        _, upd = model.apply(v, x0[:2], mode="calibrate",
                             mutable=["qobs", "qparams"])
        return model, {**v, **upd}

    def step_time(model, variables, mode: str) -> float:
        tx = optax.adam(1e-4)
        trainable_keys = [c for c in ("params", "qparams") if c in variables]
        trainable = {c: variables[c] for c in trainable_keys}
        opt_state = tx.init(trainable)

        @jax.jit
        def step(variables, opt_state, seed):
            ih = jax.lax.broadcasted_iota(jnp.float32, (batch, size, size, 3), 1)
            iw = jax.lax.broadcasted_iota(jnp.float32, (batch, size, size, 3), 2)
            img = ((ih * 7.1 + iw * 13.3) * 1e-3 + seed) % 2.0 - 1.0
            label = (jax.lax.iota(jnp.int32, batch) * 7 +
                     (seed * 100).astype(jnp.int32)) % 1000
            trainable = {c: variables[c] for c in trainable_keys}
            frozen = {c: v for c, v in variables.items()
                      if c not in trainable_keys}

            def loss_fn(tr):
                logits = model.apply({**frozen, **tr}, img, mode=mode)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, label).mean()

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, opt2 = tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return ({**frozen, **trainable}, opt2,
                    seed + 1e-3 * jnp.tanh(loss), loss)

        seed = jnp.float32(0.0)
        for _ in range(2):
            variables, opt_state, seed, loss = step(variables, opt_state, seed)
            float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            variables, opt_state, seed, loss = step(variables, opt_state, seed)
            float(loss)
        return (time.perf_counter() - t0) / iters

    def loss_trajectory(model, variables, mode: str, steps: int = 5):
        """Fixed-seed loss sequence (fidelity check for fake-quant dtype
        A/Bs — same init, same synthetic batches)."""
        tx = optax.adam(1e-4)
        trainable_keys = [c for c in ("params", "qparams") if c in variables]
        trainable = {c: variables[c] for c in trainable_keys}
        opt_state = tx.init(trainable)

        @jax.jit
        def step(variables, opt_state, i):
            ih = jax.lax.broadcasted_iota(jnp.float32, (batch, size, size, 3), 1)
            iw = jax.lax.broadcasted_iota(jnp.float32, (batch, size, size, 3), 2)
            img = ((ih * 7.1 + iw * 13.3) * 1e-3 + i * 1e-2) % 2.0 - 1.0
            label = (jax.lax.iota(jnp.int32, batch) * 7 + i) % 1000
            trainable = {c: variables[c] for c in trainable_keys}
            frozen = {c: v for c, v in variables.items()
                      if c not in trainable_keys}

            def loss_fn(tr):
                logits = model.apply({**frozen, **tr}, img, mode=mode)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, label).mean()

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, opt2 = tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return {**frozen, **trainable}, opt2, loss

        losses = []
        for i in range(steps):
            variables, opt_state, loss = step(variables, opt_state,
                                              jnp.int32(i))
            losses.append(float(loss))
        return losses

    model_q, v_q = build(QuantCtx(_mk_cfg(wbits)))
    t_q = step_time(model_q, v_q, "quant")
    tr_f32sim = loss_trajectory(model_q, v_q, "quant")

    # A/B: bf16 fake-quant arithmetic (r4 VERDICT item 5) — same process,
    # same model state, same synthetic batches; restore f32 afterwards
    from quantize_tpu.quant.fakequant import set_quant_sim_dtype

    set_quant_sim_dtype("bfloat16")
    t_qb = step_time(model_q, v_q, "quant")
    tr_bf16sim = loss_trajectory(model_q, v_q, "quant")
    set_quant_sim_dtype(None)

    model_f, v_f = build(QuantCtx.fp32())
    t_f = step_time(model_f, v_f, "fp32")

    fid = max(abs(a - b) / max(abs(a), 1e-9)
              for a, b in zip(tr_f32sim, tr_bf16sim))
    print(json.dumps({
        "metric": f"{model_name}_w{wbits}a8_qat_train_step",
        "value": round(batch / t_q, 1), "unit": "img/s/chip",
        "vs_baseline": round(t_f / t_q, 3), "baseline_dtype": "f32-train",
        "detail": {"batch": batch, "image": size,
                   "quant_ms_per_step": round(t_q * 1e3, 2),
                   "bf16sim_ms_per_step": round(t_qb * 1e3, 2),
                   "bf16sim_img_per_s": round(batch / t_qb, 1),
                   "bf16sim_vs_f32_train": round(t_f / t_qb, 3),
                   "bf16sim_loss_max_rel_diff": round(fid, 5),
                   "loss_f32sim": [round(v, 5) for v in tr_f32sim],
                   "loss_bf16sim": [round(v, 5) for v in tr_bf16sim],
                   "fp32_ms_per_step": round(t_f * 1e3, 2),
                   "fp32_img_per_s": round(batch / t_f, 1)},
    }))


def bench_adaround() -> None:
    from quantize_tpu.runners import execute_runner
    from quantize_tpu.utils import Config

    batch = int(os.environ.get("BENCH_BATCH", 32))
    size = int(os.environ.get("BENCH_SIZE", 224))
    n_batches = int(os.environ.get("BENCH_K", 4))
    model_name = os.environ.get("BENCH_MODEL", "mobilenet_v2")
    epochs = int(os.environ.get("BENCH_EPOCHS", 2))

    cfg = Config({
        "seed": 0,
        "output_dir": "/tmp/bench_adaround",
        "model": {"name": model_name},
        "runner": {"name": "adaround", "beta": "dynamic",
                   "reconstruction": "blockwise",
                   "max_cached_batches": n_batches},
        "quant": {"default": {
            "weight": {"n_bits": 4, "symmetric": True, "signed": True,
                       "granularity": "channel", "range": {"name": "minmax"},
                       "adaround": {"apply": True}},
            "activation": {"n_bits": 32},
            "bn_folding": True}},
        "train": {"max_epoch": epochs, "print_freq": 1000, "eval_freq": 0},
        "optimizer": {"name": "adam", "lr": 1e-2},
        "lr_scheduler": {"name": "constant"},
        "train_dataset": {"name": "synthetic", "split": "train",
                          "n": batch * n_batches, "image_size": size},
        "val_dataset": {"name": "synthetic", "split": "val", "n": batch,
                        "image_size": size},
        "test_dataset": {"name": "synthetic", "split": "test", "n": batch,
                         "image_size": size},
        "train_loader": {"batch_size": batch},
        "val_loader": {"batch_size": batch},
        "test_loader": {"batch_size": batch},
    })
    t0 = time.perf_counter()
    execute_runner(cfg)
    wall = time.perf_counter() - t0
    total_imgs = batch * n_batches * epochs
    print(json.dumps({
        "metric": f"{model_name}_w4_adaround_blockwise",
        "value": round(wall, 2), "unit": "s_wall_total",
        "vs_baseline": None, "baseline_dtype": None,
        "detail": {"batch": batch, "image": size, "cached_batches": n_batches,
                   "epochs": epochs,
                   "scan": os.environ.get("QTPU_ADAROUND_SCAN_MB", "2048"),
                   "recon_imgs_per_s": round(total_imgs / wall, 2)},
    }))


if __name__ == "__main__":
    mode = os.environ.get("BENCH_TRAIN", "qat")
    if mode == "qat":
        bench_qat()
    else:
        bench_adaround()
