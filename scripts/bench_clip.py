"""CLIP zero-shot packed inference benchmark (BASELINE config[4] perf).

Measures the packed (W8A8 image tower, quantized text tower precomputed
once) CLIP ViT-B/16 zero-shot classification rate on one chip, with the
same methodology as bench.py: CPU-side calibrate+pack, on-device batch
synthesis, BENCH_K seed-chained batches per dispatch, hard value fetch,
bf16-forward baseline. The reference counterpart is the CLIPModel eval loop
(``modelzoo/clip/__init__.py:53-60``) which published no throughput.

Prints ONE JSON line and writes results/BENCH_<metric>_latest.json
(off-headline batches get a _b{batch} suffix via bench.write_record).
Env: BENCH_BATCH (128) / BENCH_K (32) / BENCH_ITERS (5) / BENCH_BACKBONE.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_clip_on_cpu(size: int = 224, wbits: int = 8,
                      num_classes: int = 1000, backbone: str = "ViT-B/16"):
    """CLIP zero-shot CPU-side build: calibrate, precompute zero-shot
    weights (hash-tokenized class prompts), pack. Shared with
    scripts/profile_packed.py so the profiled model IS the benched model.
    Returns (model, base_vars, deploy)."""
    import jax
    import jax.numpy as jnp

    from quantize_tpu.deploy import pack_model
    from quantize_tpu.models.clip import (CLIPZeroShot, HashTokenizer,
                                          build_zeroshot)
    from quantize_tpu.nn.intercept import QuantCtx

    cfg = {"default": {
        "weight": {"n_bits": wbits, "symmetric": True, "signed": True,
                   "granularity": "channel", "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True}}
    model = CLIPZeroShot(backbone=backbone, num_classes=num_classes,
                         ctx=QuantCtx(cfg))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, size, size, 3)).astype(np.float32))
        cv = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
        cv.pop("taps", None)
        _, upd = model.apply(cv, x, mode="calibrate",
                             mutable=["qobs", "qparams"])
        cv = {**cv, **upd}
        tok = HashTokenizer(49408)
        names = [f"class{i}" for i in range(num_classes)]
        cv = build_zeroshot(model, cv, names, tokenizer=tok, mode="calibrate")
        cv = build_zeroshot(model, cv, names, tokenizer=tok, mode="quant")
        deploy = jax.device_get(pack_model(model, cv, x))
        base_vars = jax.device_get({"params": cv["params"],
                                    "qparams": cv["qparams"],
                                    "zeroshot": cv["zeroshot"]})
    return model, base_vars, deploy


def main() -> None:
    import jax
    import jax.numpy as jnp

    from quantize_tpu.nn.precision import set_packed_carry_dtype

    batch = int(os.environ.get("BENCH_BATCH", 128))
    size = 224
    iters = int(os.environ.get("BENCH_ITERS", 5))
    # 32 chained batches per dispatch, matching bench.py: at K=8 the ~30 ms
    # tunnel overhead added ~3.7 ms/step and understated throughput by ~10%
    k = int(os.environ.get("BENCH_K", 32))
    backbone = os.environ.get("BENCH_BACKBONE", "clip_vit-b16")
    num_classes = 1000

    bb = backbone.replace("clip_", "").replace("vit-b16", "ViT-B/16")
    model, base_vars, deploy = build_clip_on_cpu(
        size, wbits=8, num_classes=num_classes, backbone=bb)

    set_packed_carry_dtype("bfloat16")
    dev = jax.devices()[0]

    def make_step(mode, in_dtype=None):
        def one(v, seed):
            n, h, w, c = batch, size, size, 3
            ih = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, c), 1)
            iw = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, c), 2)
            ic = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, c), 3)
            img = ((ih * 7.1 + iw * 13.3 + ic * 29.7) * 1e-2 + seed) % 2.0 - 1.0
            if in_dtype is not None:
                img = img.astype(in_dtype)
            out = model.apply(v, img, mode=mode)
            return seed + 1e-3 * jnp.tanh(jnp.mean(out).astype(jnp.float32)) + 1e-3, out

        @jax.jit
        def step(v, seed):
            def body(carry, _):
                s, out = one(v, carry)
                return s, jnp.mean(out)
            seed, outs = jax.lax.scan(body, seed, None, length=k)
            return seed, outs

        return step

    def timeit(step, v):
        seed = jnp.float32(0.0)
        for _ in range(2):
            seed, out = step(v, seed)
            float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            seed, out = step(v, seed)
            float(jnp.sum(out))
        return (time.perf_counter() - t0) / iters

    packed_step = make_step("packed")
    t_packed = timeit(packed_step, jax.device_put(deploy, dev))
    img_s = batch * k / t_packed

    bf = jnp.bfloat16
    base_cast = {
        "params": jax.tree.map(lambda a: a.astype(bf) if hasattr(a, "dtype")
                               and a.dtype == np.float32 else a,
                               base_vars["params"]),
        "qparams": base_vars["qparams"],
        "zeroshot": base_vars["zeroshot"],
    }
    base_step = make_step("fp32", in_dtype=bf)
    t_base = timeit(base_step, jax.device_put(base_cast, dev))

    import bench

    record = {
        "metric": f"{backbone}_w8a8_zeroshot_packed",
        "value": round(img_s, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(t_base / t_packed, 3),
        "baseline_dtype": "bfloat16",
    }
    out_rec = bench.write_record(record, batch,
                                 headline_batch=bench.headline_batch_for("clip"))
    print(json.dumps(out_rec))


if __name__ == "__main__":
    main()
