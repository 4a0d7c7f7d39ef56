"""Continuous-batching serving throughput (north-star capability).

Drives the :class:`~quantize_tpu.parallel.serving.InferenceEngine` —
single-image submits, host-side coalescing into fixed-shape batches,
async dispatch + drain-thread materialization — against the packed
ResNet-50 W8A8 forward on the real chip, and reports sustained img/s plus
the engine's own stats (batch fill, in-flight overlap).

This measures the SERVING STACK, not the raw forward: the number includes
request queuing, host batching, host->device transfer of real image
payloads, and result materialization back to numpy. On a small-core host
the feeder can be the bottleneck — cores and feeder processes are recorded
alongside the result. No reference counterpart exists (single-GPU batch
eval only, SURVEY.md §2.3).

Usage: BENCH_SERVE_N=4096 BENCH_BATCH=256 python scripts/bench_serving.py
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
    import bench
    from quantize_tpu.nn.precision import set_packed_carry_dtype
    from quantize_tpu.parallel.serving import InferenceEngine

    model_name = os.environ.get("BENCH_MODEL", "resnet50")
    w_bits = int(os.environ.get("BENCH_WBITS", 8))
    default_batch = bench.headline_batch_for(model_name)
    batch = int(os.environ.get("BENCH_BATCH", default_batch))
    n_total = int(os.environ.get("BENCH_SERVE_N", 4096))
    size = int(os.environ.get("BENCH_SIZE", 224))

    feed = os.environ.get("BENCH_SERVE_FEED", "uint8")  # uint8 | device

    model, variables, deploy = bench._build_on_cpu(size, model_name, w_bits, 8)
    set_packed_carry_dtype("bfloat16")

    import jax

    deploy_dev = jax.device_put(deploy, jax.devices()[0])
    if feed == "device":
        _main_device_feed(bench, model, deploy_dev, model_name, w_bits,
                          batch, n_total, size, default_batch)
        return
    # uint8 pixel ingress + on-device dequant-normalize: quarters the
    # host->device payload, which IS the serving bottleneck (measured
    # ~35 MB/s fresh-buffer ingress through this environment's tunnel;
    # PCIe-attached chips are faster but ingress-bound at scale too)
    import jax.numpy as jnp_

    engine = InferenceEngine(
        model, deploy_dev, batch_size=batch, mode="packed", max_wait_ms=5.0,
        max_in_flight=4, input_dtype=np.uint8,
        preprocess=lambda x: x.astype(jnp_.float32) / 64.0 - 2.0)

    rng = np.random.default_rng(0)
    pool = [rng.integers(0, 255, size=(size, size, 3)).astype(np.uint8)
            for _ in range(64)]

    # pre-compile the packed forward OUTSIDE the dispatch thread (remote
    # compiles take minutes; the engine threads should only ever execute)
    import jax.numpy as jnp

    warm = jnp.asarray(np.stack([pool[i % 64] for i in range(batch)]))

    np.asarray(engine._forward(engine.variables, warm))

    with engine:
        # pipeline spin-up batch
        futs = [engine.submit(np.roll(pool[i % 64], i, axis=0)) for i in range(batch)]
        for f in futs:
            f.result(timeout=900)

        t0 = time.perf_counter()
        futs = []
        for i in range(n_total):
            futs.append(engine.submit(pool[i % 64]))
        for f in futs:
            f.result(timeout=600)
        dt = time.perf_counter() - t0
    stats = engine.stats()

    record = {
        "metric": f"{model_name}_w{w_bits}a8_serving_continuous_batching",
        "value": round(n_total / dt, 1),
        "unit": "img/s/chip",
        "batch_size": batch,
        "mean_batch_fill": round(stats["mean_batch_fill"], 3),
        "max_in_flight_observed": engine.max_observed_in_flight,
        "failed": stats["failed"],
        "host_cores": os.cpu_count(),
        "input_dtype": "uint8",
    }
    import bench

    out_rec = bench.write_record(record, batch, headline_batch=default_batch)
    print(json.dumps(out_rec))


def _main_device_feed(bench, model, deploy_dev, model_name, w_bits, batch,
                      n_total, size, default_batch) -> None:
    """BENCH_SERVE_FEED=device: requests reference frames already resident
    on device (the engine gathers them in-graph; the host ships only int32
    indices), so the number measures the ENGINE's own overhead — queuing,
    batching window, async dispatch, drain — not ingress bandwidth. The
    same process also times the raw jitted forward on identical gathered
    batches, and the record reports serving/raw as ``engine_efficiency``
    (r4 VERDICT item 4: the number a pod deployment actually needs)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from quantize_tpu.parallel.serving import InferenceEngine

    rng = np.random.default_rng(0)
    pool = jax.device_put(
        jnp.asarray(rng.normal(size=(64, size, size, 3)).astype(np.float32)),
        jax.devices()[0])

    in_flight = int(os.environ.get("BENCH_SERVE_INFLIGHT", 4))
    # BENCH_SERVE_POST=top1: classify on device, fetch int32 labels only —
    # isolates how much of the engine gap is result EGRESS (the full
    # 1000-class logits cost ~3.9 ms/batch of drain fetch here)
    post = (lambda o: jnp.argmax(o, -1))         if os.environ.get("BENCH_SERVE_POST") == "top1" else None
    engine = InferenceEngine(model, deploy_dev, batch_size=batch,
                             mode="packed", max_wait_ms=5.0,
                             max_in_flight=in_flight, frame_pool=pool,
                             postprocess=post)

    # raw forward on the same gather + forward graph, K-chained (the
    # bench.py methodology), same process so the ratio is drift-free.
    # Sync per iteration via a hard fetch of an output slice — scalar-only
    # fetches under-synchronize on this runtime (bench.py::_time)
    k = int(os.environ.get("BENCH_K", 8))

    @jax.jit
    def raw_step(v, seed):
        def body(c, _):
            idx = (jax.lax.broadcasted_iota(jnp.int32, (batch,), 0)
                   + c.astype(jnp.int32)) % 64
            out = model.apply(v, jnp.take(pool, idx, axis=0), mode="packed")
            return c + 1e-3 * jnp.tanh(jnp.mean(out).astype(jnp.float32)) + 1.0, out
        c, outs = jax.lax.scan(body, seed, None, length=k)
        return c, outs[-1]

    def fetch(pair):
        return np.asarray(pair[1][:1])

    fetch(raw_step(deploy_dev, jnp.float32(0.0)))  # compile + warm
    iters = 4
    best = 1e9
    for i in range(iters):
        seed = jnp.float32(1.0 + i)
        np.asarray(seed)
        t0 = _time.perf_counter()
        fetch(raw_step(deploy_dev, seed))
        best = min(best, _time.perf_counter() - t0)
    raw_img_s = batch * k / best

    # engine warm-up (compile happens on first _forward)
    warm_idx = jnp.asarray(np.arange(batch, dtype=np.int32) % 64)
    np.asarray(engine._forward(engine.variables, warm_idx))

    # chunk-future submission (submit_batch): one queue entry AND one
    # result future per batch_size requests — per-request queue ops and
    # Future create/set_result/result churn were the engine's limiter past
    # ~5k req/s on this 2-core host (submit_many at 8k req/s: 0.77
    # efficiency; see BENCH_NOTES r5). BENCH_SERVE_SUBMIT=many reverts.
    idx_all = (np.arange(n_total, dtype=np.int32) % 64)
    sub = (engine.submit_many
           if os.environ.get("BENCH_SERVE_SUBMIT") == "many"
           else engine.submit_batch)
    with engine:
        futs = sub(np.arange(batch, dtype=np.int32) % 64)
        for f in futs:
            f.result(timeout=900)
        t0 = _time.perf_counter()
        futs = sub(idx_all)
        for f in futs:
            f.result(timeout=600)
        dt = _time.perf_counter() - t0
    stats = engine.stats()
    serve_img_s = n_total / dt

    record = {
        "metric": f"{model_name}_w{w_bits}a8_serving_device_feed",
        "value": round(serve_img_s, 1),
        "unit": "img/s/chip",
        "batch_size": batch,
        "raw_forward_img_s": round(raw_img_s, 1),
        "engine_efficiency": round(serve_img_s / raw_img_s, 3),
        "mean_batch_fill": round(stats["mean_batch_fill"], 3),
        "max_in_flight_observed": engine.max_observed_in_flight,
        "failed": stats["failed"],
        "host_cores": os.cpu_count(),
        "input": "device-resident pool (int32 indices)",
        "max_in_flight": in_flight,
        "postprocess": os.environ.get("BENCH_SERVE_POST", "none"),
        "submit_path": ("submit_many"
                        if os.environ.get("BENCH_SERVE_SUBMIT") == "many"
                        else "submit_batch"),
    }
    out_rec = bench.write_record(record, batch, headline_batch=default_batch)
    print(json.dumps(out_rec))


if __name__ == "__main__":
    main()
