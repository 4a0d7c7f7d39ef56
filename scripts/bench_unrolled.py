"""Throughput experiment: K serialized batches per dispatch, profiler-verified.

The per-call measured packed throughput on this environment is dominated by
~25-30 ms of execution-tunnel dispatch overhead per call (ground truth:
device-lane profile shows ~20.3 ms/step of actual TPU time at batch 256 while
wall-clock per chained call is ~47 ms). Production serving amortizes dispatch
by keeping multiple batches in flight on device; this script emulates that
with K data-dependent (seed-chained) model applications per dispatch, and
cross-checks wall-clock against the device-lane profile so the number stays
physically consistent (each batch's input depends on the previous batch's
output, so XLA cannot parallelize or elide any application).

Usage: python scripts/bench_unrolled.py [--k 8] [--batch 256] [--profile]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--carry", default="bfloat16")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--scan", action="store_true",
                    help="lax.scan body instead of unrolled (fast compile; "
                    "trust only the device-lane profile, not wall-clock)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench

    model, variables, deploy = bench._build_on_cpu(args.size)
    if args.carry not in ("float32", "f32"):
        from quantize_tpu.nn.precision import set_packed_carry_dtype

        set_packed_carry_dtype(args.carry)

    dev = jax.devices()[0]
    v_dev = jax.device_put(deploy, dev)
    batch, size, K = args.batch, args.size, args.k

    def one(v, seed):
        n, h, w, c = batch, size, size, 3
        ih = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, c), 1)
        iw = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, c), 2)
        ic = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, c), 3)
        img = ((ih * 7.1 + iw * 13.3 + ic * 29.7) * 1e-2 + seed) % 2.0 - 1.0
        out = model.apply(v, img, mode="packed")
        return seed + 1e-3 * jnp.tanh(jnp.mean(out)) + 1e-3, out

    if args.scan:
        @jax.jit
        def step_k(v, seed):
            def body(carry, _):
                s, out = one(v, carry)
                return s, jnp.mean(out)
            seed, outs = jax.lax.scan(body, seed, None, length=K)
            return seed, outs

    else:
        @jax.jit
        def step_k(v, seed):
            out = None
            for _ in range(K):  # unrolled, seed-serialized
                seed, out = one(v, seed)
            return seed, out

    seed = jnp.float32(0.0)
    for _ in range(2):
        seed, out = step_k(v_dev, seed)
        float(jnp.sum(out))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        seed, out = step_k(v_dev, seed)
        float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"K={K} batch={batch}: {dt*1e3:.2f} ms/dispatch  "
          f"{K*batch/dt:.0f} img/s  ({dt*1e3/K:.2f} ms/batch)")

    if args.profile:
        trace_dir = "/tmp/qtpu_profile_unrolled"
        with jax.profiler.trace(trace_dir):
            seed, out = step_k(v_dev, seed)
            float(jnp.sum(out))
        from profile_packed import summarize_trace

        _, rows, cnt, total = summarize_trace(trace_dir)
        # module-level event = actual device busy time for the dispatch
        mod = [r for r in rows if r[0].startswith("jit_step")]
        if mod:
            name, dur = mod[0]
            print(f"device-lane module time: {dur/1e3:.2f} ms "
                  f"-> {K*batch/(dur/1e6):.0f} img/s on-device")


if __name__ == "__main__":
    main()
