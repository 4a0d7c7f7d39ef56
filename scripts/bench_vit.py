"""ViT-B/16 W4A8 packed inference benchmark (BASELINE.json's second headline).

Same methodology as bench.py (CPU-side pack, on-device batch synthesis,
BENCH_K seed-chained batches per dispatch under lax.scan, hard value
fetches). Prints one JSON line. BENCH_CARRY sets the packed inter-layer
carry dtype (default bfloat16, as bench.py).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from quantize_tpu.deploy import pack_model
    from quantize_tpu.models import MODELS
    from quantize_tpu.nn.intercept import QuantCtx

    batch = int(os.environ.get("BENCH_BATCH", 128))
    size = int(os.environ.get("BENCH_SIZE", 224))
    iters = int(os.environ.get("BENCH_ITERS", 5))
    k_per_dispatch = int(os.environ.get("BENCH_K", 8))
    carry = os.environ.get("BENCH_CARRY", "bfloat16")

    cfg = {
        "default": {
            "weight": {"n_bits": 4, "symmetric": True, "signed": True,
                       "granularity": "channel", "range": {"name": "minmax"}},
            "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                           "range": {"name": "minmax"}},
            "bn_folding": True,
        }
    }
    model = MODELS.build("vit_b_16", num_classes=1000, ctx=QuantCtx(cfg))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        rng = np.random.default_rng(0)
        x_small = jnp.asarray(rng.normal(size=(2, size, size, 3)).astype(np.float32))
        variables = dict(model.init(jax.random.PRNGKey(0), x_small, mode="calibrate"))
        variables.pop("taps", None)
        _, upd = model.apply(variables, x_small, mode="calibrate",
                             mutable=["qobs", "qparams"])
        variables = {**variables, **upd}
        deploy = jax.device_get(pack_model(model, variables, x_small))

    dev = jax.devices()[0]
    deploy_dev = jax.device_put(deploy, dev)

    if carry not in ("float32", "f32"):
        from quantize_tpu.nn.precision import set_packed_carry_dtype

        set_packed_carry_dtype(carry)

    def one(v, seed):
        ih = jax.lax.broadcasted_iota(jnp.float32, (batch, size, size, 3), 1)
        iw = jax.lax.broadcasted_iota(jnp.float32, (batch, size, size, 3), 2)
        img = ((ih * 7.1 + iw * 13.3) * 1e-2 + seed) % 2.0 - 1.0
        out = model.apply(v, img, mode="packed")
        return seed + 1e-3 * jnp.tanh(jnp.mean(out)) + 1e-3, out

    if k_per_dispatch <= 1:
        step = jax.jit(one)
    else:
        @jax.jit
        def step(v, seed):
            def body(c, _):
                s, o = one(v, c)
                return s, jnp.mean(o)
            return jax.lax.scan(body, seed, None, length=k_per_dispatch)

    seed = jnp.float32(0.0)
    for _ in range(2):
        seed, out = step(deploy_dev, seed)
        float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        seed, out = step(deploy_dev, seed)
        float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "vit_b16_w4a8_packed_inference",
        "value": round(batch * max(k_per_dispatch, 1) / dt, 1),
        "unit": "img/s/chip",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
