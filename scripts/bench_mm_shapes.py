"""Shape sweep: practical int8/bf16 matmul ceiling on this chip.

Chained-scan methodology (see bench_mm_probe.py). Prints one JSON line per
(shape, dtype).
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("PROBE_ITERS", 2))
CHAIN = int(os.environ.get("PROBE_CHAIN", 16))

SHAPES = [
    (4096, 4096, 4096),
    (8192, 8192, 8192),
    (25216, 3072, 768),   # ViT-B MLP linear2
    (25216, 768, 3072),   # ViT-B MLP linear1
    (25216, 768, 2304),   # fused qkv
    (25216, 3072, 3072),  # N padded up
]


def run(m, k, n, dtype):
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    if dtype == "int8":
        a = jax.device_put(jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8), dev)
        w = jax.device_put(jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8), dev)
        pref = jnp.int32
    else:
        a = jax.device_put(jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16), dev)
        w = jax.device_put(jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16), dev)
        pref = jnp.float32

    @jax.jit
    def step(seed, a, w):
        def body(c, _):
            aa = a + c.astype(a.dtype) * 0
            out = jax.lax.dot_general(aa, w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=pref)
            return c + 1e-6 * jnp.mean(out.astype(jnp.float32)), ()
        c, _ = jax.lax.scan(body, seed, None, length=CHAIN)
        return c

    seed = jnp.float32(0.0)
    for _ in range(2):
        seed = step(seed, a, w)
        float(seed)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        seed = step(seed, a, w)
        float(seed)
    dt = (time.perf_counter() - t0) / (ITERS * CHAIN)
    tops = 2 * m * k * n / dt / 1e12
    print(json.dumps({"shape": [m, k, n], "dtype": dtype,
                      "ms": round(dt * 1e3, 3), "TOPs": round(tops, 1)}),
          flush=True)


def main():
    for m, k, n in SHAPES:
        for dtype in ("int8", "bf16"):
            run(m, k, n, dtype)


if __name__ == "__main__":
    main()
