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

    model, variables, deploy = bench._build_on_cpu(size, model_name, w_bits, 8)
    set_packed_carry_dtype("bfloat16")

    import jax

    deploy_dev = jax.device_put(deploy, jax.devices()[0])
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


if __name__ == "__main__":
    main()
