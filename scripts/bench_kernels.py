"""Kernel microbenchmarks (chained in-scan timing; run on TPU).

Usage: python scripts/bench_kernels.py [sizes...]
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import jax, jax.numpy as jnp, numpy as np
from quantize_tpu.ops.pallas.qmatmul import (
    quant_matmul_w8a8, quant_matmul_w8a8_xla, quant_matmul_w4a8, pack_int4_splithalf)


def bench_scan(f, x0, iters=16):
    @jax.jit
    def loop(x):
        def body(c, _):
            out = f(c)
            return jnp.tanh(out * 1e-3), ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out
    jax.block_until_ready(loop(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(x0 + 1e-6))
    return (time.perf_counter() - t0) / iters


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [2048, 4096]
    rng = np.random.default_rng(0)
    for sz in sizes:
        fl = 2 * sz ** 3
        w8 = jax.device_put(np.asarray(rng.integers(-128, 128, (sz, sz)), np.int8))
        w4 = jax.device_put(np.asarray(rng.integers(-8, 8, (sz, sz)), np.int8))
        p4 = pack_int4_splithalf(w4)
        ws = jnp.full((sz,), 0.01, jnp.float32)
        wz = jnp.zeros((sz,), jnp.float32)
        b = jnp.zeros((sz,), jnp.float32)
        a_s, a_z = jnp.asarray(0.02, jnp.float32), jnp.asarray(-10.0, jnp.float32)
        x0 = jax.device_put(rng.normal(size=(sz, sz)).astype(np.float32))
        for tag, f in (
            ("pallas w8a8", lambda c: quant_matmul_w8a8(c, a_s, a_z, 0, 255, w8, ws, wz, b)),
            ("xla    w8a8", lambda c: quant_matmul_w8a8_xla(c, a_s, a_z, 0, 255, w8, ws, wz, b)),
            ("pallas w4a8", lambda c: quant_matmul_w4a8(c, a_s, a_z, 0, 255, p4, ws, wz, b)),
            ("bf16 matmul", lambda c: (c.astype(jnp.bfloat16) @ w8.astype(jnp.bfloat16)).astype(jnp.float32)),
        ):
            t = bench_scan(f, x0)
            print(f"{tag} {sz}: {t*1e6:.0f} us  {fl/t/1e12:.1f} TOP/s")


if __name__ == "__main__":
    main()
