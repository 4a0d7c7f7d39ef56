"""Microbench: where does the packed ViT matmul lose MXU efficiency?

Times K-chained (scan) variants of the linear2-shaped int8 matmul
(M=25216, K=3072, N=768) on the chip:

  a) bare int8 dot (int32 accum)
  b) int4-splithalf unpack fused into the dot operand (two half-K dots)
  c) b + f32 epilogue (scale/colsum correction) + bf16 cast
  d) c + residual add + LayerNorm stats (the fusion XLA actually builds)
  e) bf16 x bf16 dot (reference point)

Prints one JSON line per variant with effective TOP/s.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

M, K, N = 25216, 3072, 768
ITERS = int(os.environ.get("PROBE_ITERS", 3))
CHAIN = int(os.environ.get("PROBE_CHAIN", 16))


def unpack_split(p):
    lo = (p.astype(jnp.int8) << 4) >> 4
    hi = p.astype(jnp.int8) >> 4
    return jnp.concatenate([lo, hi], axis=0)


def time_variant(name, fn, flops_per_call, *args):
    @jax.jit
    def step(seed, *a):
        def body(c, _):
            out = fn(c, *a)
            return c + 1e-6 * jnp.mean(out.astype(jnp.float32)), ()
        c, _ = jax.lax.scan(body, seed, None, length=CHAIN)
        return c

    seed = jnp.float32(0.0)
    for _ in range(2):
        seed = step(seed, *args)
        float(seed)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        seed = step(seed, *args)
        float(seed)
    dt = (time.perf_counter() - t0) / (ITERS * CHAIN)
    tops = flops_per_call / dt / 1e12
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                      "TOPs": round(tops, 1)}))


def main():
    rng = np.random.default_rng(0)
    q_a = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    w_p4 = jnp.asarray(rng.integers(-128, 127, (K // 2, N)), jnp.int8)
    w_i8 = unpack_split(w_p4)
    w_bf = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    x_bf = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    w_scale = jnp.asarray(rng.uniform(1e-3, 2e-3, (N,)), jnp.float32)
    col_sum = jnp.sum(w_i8.astype(jnp.int32), axis=0)
    bias = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    resid = jnp.asarray(rng.normal(size=(M, N)), jnp.bfloat16)
    flops = 2 * M * K * N

    dev = jax.devices()[0]
    q_a, w_p4, w_i8, w_bf, x_bf = (jax.device_put(t, dev) for t in (q_a, w_p4, w_i8, w_bf, x_bf))
    w_scale, col_sum, bias, resid = (jax.device_put(t, dev) for t in (w_scale, col_sum, bias, resid))

    def dot_i8(a, w):
        return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def a_bare(c, q, w):
        q = q + c.astype(jnp.int8) * 0  # depend on carry, cheap
        return dot_i8(q, w)

    def b_unpack(c, q, wp):
        q = q + c.astype(jnp.int8) * 0
        return dot_i8(q, unpack_split(wp))

    def c_epilogue(c, q, wp, ws, cs, b):
        q = q + c.astype(jnp.int8) * 0
        acc = dot_i8(q, unpack_split(wp)).astype(jnp.float32)
        z = jnp.float32(3.7)
        out = 0.01 * ws.reshape(1, -1) * (acc + z * cs.astype(jnp.float32)[None, :]) + b
        return out.astype(jnp.bfloat16)

    def d_ln(c, q, wp, ws, cs, b, r):
        out = c_epilogue(c, q, wp, ws, cs, b)
        y = r + out
        mu = jnp.mean(y.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=-1, keepdims=True) - mu * mu
        return ((y - mu) * jax.lax.rsqrt(var + 1e-6)).astype(jnp.bfloat16)

    def e_bf16(c, x, w):
        x = x + c.astype(jnp.bfloat16) * 0
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    time_variant("a_bare_int8", a_bare, flops, q_a, w_i8)
    time_variant("b_unpack_int4", b_unpack, flops, q_a, w_p4)
    time_variant("c_epilogue", c_epilogue, flops, q_a, w_p4, w_scale, col_sum, bias)
    time_variant("d_ln_fused", d_ln, flops, q_a, w_p4, w_scale, col_sum, bias, resid)
    time_variant("e_bf16", e_bf16, flops, x_bf, w_bf)


if __name__ == "__main__":
    main()
